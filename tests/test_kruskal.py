"""Property tests for the jit Kruskal maze generator (SURVEY.md §4: the
reference has no tests; solvability/connectivity property tests are the
rebuild's substitute for visual inspection)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen2_tpu.gen.kruskal import kruskal_maze, masked_uniform_cell


def _connected_components(wall: np.ndarray, dim: int):
    """4-connected flood fill over empty cells within the dim x dim region."""
    from collections import deque

    empty = ~wall[:dim, :dim]
    seen = np.zeros_like(empty)
    comps = 0
    for i in range(dim):
        for j in range(dim):
            if empty[i, j] and not seen[i, j]:
                comps += 1
                q = deque([(i, j)])
                seen[i, j] = True
                while q:
                    x, y = q.popleft()
                    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        nx, ny = x + dx, y + dy
                        if (
                            0 <= nx < dim
                            and 0 <= ny < dim
                            and empty[nx, ny]
                            and not seen[nx, ny]
                        ):
                            seen[nx, ny] = True
                            q.append((nx, ny))
    return comps


@pytest.mark.parametrize("dim", [3, 7, 15])
def test_maze_spans_all_rooms(dim):
    gen = jax.jit(lambda k, d: kruskal_maze(k, d, max_dim=15))
    for seed in range(4):
        wall = np.asarray(gen(jax.random.key(seed), jnp.int32(dim)))
        # All even-even cells are rooms and must be carved (spanning tree).
        rooms = wall[0:dim:2, 0:dim:2]
        assert not rooms.any(), "every room cell must be empty"
        # Exactly one connected component of empty cells.
        assert _connected_components(wall, dim) == 1
        # Cells outside the maze region remain walls.
        outside = wall.copy()
        outside[:dim, :dim] = True
        assert outside.all()


def test_maze_varies_with_key():
    gen = jax.jit(lambda k: kruskal_maze(k, jnp.int32(15), max_dim=15))
    a = np.asarray(gen(jax.random.key(0)))
    b = np.asarray(gen(jax.random.key(1)))
    assert (a != b).any()
    # Determinism: same key, same maze.
    assert (np.asarray(gen(jax.random.key(0))) == a).all()


def test_masked_uniform_cell_respects_mask():
    mask = jnp.zeros((5, 5), bool).at[2, 3].set(True).at[4, 1].set(True)
    picks = set()
    for seed in range(20):
        i, j = masked_uniform_cell(jax.random.key(seed), mask)
        picks.add((int(i), int(j)))
    assert picks <= {(2, 3), (4, 1)}
    assert len(picks) == 2


def test_boruvka_matches_kruskal_bitwise():
    """Boruvka on the permutation-rank weights must carve the IDENTICAL
    wall set as sequential random-order Kruskal (the accepted set is the
    unique MST of the room graph under those weights) — key for key,
    dim for dim, including non-square-capacity padding."""
    from procgen2_tpu.gen.kruskal import boruvka_maze

    for max_dim in (15, 31):
        kf = jax.jit(lambda k, d, md=max_dim: kruskal_maze(k, d, max_dim=md))
        bf = jax.jit(lambda k, d, md=max_dim: boruvka_maze(k, d, max_dim=md))
        for seed in range(6):
            for dim in (3, max_dim // 2 + 1 | 1, max_dim):
                k = jax.random.key(seed * 131 + dim)
                a = np.asarray(kf(k, jnp.int32(dim)))
                b = np.asarray(bf(k, jnp.int32(dim)))
                np.testing.assert_array_equal(a, b)
