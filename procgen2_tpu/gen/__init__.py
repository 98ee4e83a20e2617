from .kruskal import kruskal_maze, masked_uniform_cell
