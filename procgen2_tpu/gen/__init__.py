from .kruskal import boruvka_maze, kruskal_maze, masked_uniform_cell
