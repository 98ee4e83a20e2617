"""Reference RNG oracle: predict the C++ engines' levels from a seed.

Binds native/librng_oracle.so (std::mt19937 + libstdc++ distribution
semantics behind a C ABI) and replays the reference's generation-time
draw sequences in Python. This gives bit-exact fixed-seed *layout*
prediction for the reference engines without SDL or a compiled game .so
— the missing piece for fixed-seed parity testing, since jax.random
cannot be seed-matched to std::mt19937 (SURVEY.md §2.4).

Currently implements replays for:
  * maze (games/maze/tilemap.cpp:31-109 + maze_generator.cpp:55-195):
    every uniform_int/uniform_real draw in the reference's order,
    including draws consumed by rejected Kruskal walls and by
    place_object's rejection loop;
  * climber (games/climber/tilemap.cpp:75-172 + climber.cpp:459-497):
    the platform-ladder walk with its conditional enemy/crystal draws.

Chaser/jumper/caveflyer/coinrun replays are future work; chaser's
egg/agent assignment additionally depends on libstdc++
unordered_set iteration order (games/chaser/tilemap.cpp:195-213).

Build the library first:  make -C native
"""
from __future__ import annotations

import ctypes as ct
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "librng_oracle.so",
)
_lib = None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)], check=True,
                capture_output=True,
            )
        _lib = ct.CDLL(_LIB_PATH)
        _lib.rng_create.restype = ct.c_int32
        _lib.rng_create.argtypes = [ct.c_uint32]
        _lib.rng_raw.restype = ct.c_uint32
        _lib.rng_uniform_int.restype = ct.c_int32
        _lib.rng_uniform_int.argtypes = [ct.c_int32, ct.c_int32, ct.c_int32]
        _lib.rng_uniform_float.restype = ct.c_float
        _lib.rng_uniform_float.argtypes = [ct.c_int32, ct.c_float, ct.c_float]
    return _lib


class Mt19937:
    """A seeded std::mt19937 with libstdc++ distribution draws."""

    def __init__(self, seed: int):
        self._lib = _load()
        self._h = self._lib.rng_create(ct.c_uint32(seed & 0xFFFFFFFF))
        if self._h < 0:
            raise RuntimeError("rng_oracle handle pool exhausted")

    def raw(self) -> int:
        return int(self._lib.rng_raw(self._h))

    def uniform_int(self, lo: int, hi: int) -> int:
        """std::uniform_int_distribution<int>(lo, hi) — inclusive bounds."""
        return int(self._lib.rng_uniform_int(self._h, lo, hi))

    def uniform_float(self, lo: float = 0.0, hi: float = 1.0) -> float:
        return float(self._lib.rng_uniform_float(self._h, lo, hi))

    def close(self):
        self._lib.rng_destroy(self._h)


WALL_CELL, EMPTY_CELL, GOAL = 1, 0, 2
START_CELL = 0  # maze_generator.h: the agent's corner cell index


def reference_maze_layout(seed: int, mode: str = "easy"):
    """Replay the reference maze generation for `seed`.

    Returns dict(maze_dim, margin, wall [dim, dim] bool in maze coords
    (i, j), goal (i, j), bg_index, bg_offset) — exactly what
    libMaze.so's reset() would produce after rng.seed(seed)
    (games/maze/maze.cpp:254,419-430).
    """
    world_dim = {"easy": 15, "hard": 25, "memory": 31}[mode]
    rng = Mt19937(seed)
    try:
        # tilemap.cpp:61-63
        maze_dim = rng.uniform_int(0, (world_dim - 1) // 2 - 1) * 2 + 3
        margin = (world_dim - maze_dim) // 2

        # --- generate_maze (maze_generator.cpp:55-139) ---
        D = maze_dim
        grid = np.ones((D, D), np.int8)  # WALL_CELL (unpadded view)
        grid[0, 0] = EMPTY_CELL
        walls = []  # (x1, y1, x2, y2)
        for i in range(1, D - 1, 2):
            for j in range(0, D, 2):
                walls.append((i - 1, j, i + 1, j))
        for i in range(0, D, 2):
            for j in range(1, D - 1, 2):
                walls.append((i, j - 1, i, j + 1))

        parent = np.arange(D * D, dtype=np.int64)
        rank = np.zeros(D * D, np.int64)
        free_cells: list[int] = []
        free_set: set[int] = set()

        def find(c):
            while parent[c] != c:
                parent[c] = parent[parent[c]]
                c = parent[c]
            return c

        def add_free(x, y):
            grid[x, y] = EMPTY_CELL
            idx = y + D * x
            if idx not in free_set:
                free_set.add(idx)
                free_cells.append(idx)

        while walls:
            n = rng.uniform_int(0, len(walls) - 1)
            x1, y1, x2, y2 = walls[n]
            s0 = find(y1 + D * x1)
            s1 = find(y2 + D * x2)
            x0, y0 = (x1 + x2) // 2, (y1 + y2) // 2
            center = y0 + D * x0
            if grid[x0, y0] == WALL_CELL and s0 != s1:
                add_free(x1, y1)
                add_free(x0, y0)
                add_free(x2, y2)
                if rank[s0] > rank[s1]:
                    parent[s1] = s0
                    parent[center] = s0
                else:
                    parent[s0] = s1
                    parent[center] = s1
                    if rank[s0] == rank[s1]:
                        rank[s1] += 1
            walls.pop(n)

        # --- place_object(GOAL) (maze_generator.cpp:183-195) ---
        fc = list(free_cells)
        idx = rng.uniform_int(0, len(fc) - 1)
        while fc[idx] == START_CELL:
            idx = rng.uniform_int(0, len(fc) - 1)
        goal_cell = fc[idx]
        goal = (goal_cell // D, goal_cell % D)

        # --- theming draws (maze.cpp:424-430) ---
        bg_index = rng.uniform_int(0, 8)
        bg_offset = rng.uniform_float(0.0, 1.0)

        return dict(
            maze_dim=maze_dim,
            margin=margin,
            wall=grid == WALL_CELL,
            goal=goal,
            bg_index=bg_index,
            bg_offset=bg_offset,
        )
    finally:
        rng.close()


def reference_climber_layout(seed: int, easy_mode: bool = False):
    """Replay the reference climber generation for `seed`.

    Draw order follows System_Tilemap::regenerate
    (games/climber/tilemap.cpp:99-171) and the post-regenerate theming
    draws in reset() (climber.cpp:466-492). Returns tile grid in (x,
    y_up) coords plus mob/crystal placements and theme indices.
    """
    W, H = 20, 64  # tilemap.cpp:76-77
    rng = Mt19937(seed)
    try:
        grid = np.zeros((W, H), np.int8)  # 0 empty, 1 top, 2 mid
        grid[:, 0] = 1  # set_area_with_top h=1 -> top row
        grid[0, :] = 2
        grid[W - 1, :] = 2
        grid[:, H - 1] = 2

        difficulty = rng.uniform_int(1, 3)  # tilemap.cpp:99-101
        num_platforms = rng.uniform_int(
            difficulty * difficulty + 1, (difficulty + 1) ** 2 + 1
        )
        curr_x = rng.uniform_int(2, W - 3)  # init_x_dist(2, 17)
        curr_y = 1
        enemy_prob = 0.2 if easy_mode else 0.5
        max_dy = int(1.5 * 1.5 / (2.0 * 0.2) - 0.5)  # = 5

        mobs = []  # (x, y_up, vx_sign)
        crystals = []  # (x, y_up)
        for p in range(num_platforms):
            delta_y = rng.uniform_int(3, max_dy - 1)
            can_spawn = 3 <= curr_x <= W - 4
            if can_spawn and rng.uniform_float() < enemy_prob:
                # arg expression draws dist2 first, then spawn draws the
                # velocity sign (tilemap.cpp:40-41,134-135)
                mob_y = curr_y + rng.uniform_int(0, 1) + 2
                vx_sign = rng.uniform_int(0, 1) * 2 - 1
                mobs.append((curr_x, mob_y, vx_sign))
            curr_y += delta_y
            plat_len = 2 + rng.uniform_int(0, 9)
            vx = rng.uniform_int(0, 1) * 2 - 1
            if curr_x < 3:
                vx = 1
            if curr_x > W - 3:
                vx = -1
            candidates = []
            for j in range(plat_len):
                nx = curr_x + (j + 1) * vx
                if nx <= 0 or nx >= W - 1:
                    break
                candidates.append(nx)
                if curr_y < H:
                    grid[nx, curr_y] = 1  # wall_top
            if rng.uniform_float() < 0.5 or p == num_platforms - 1:
                crystals.append(
                    (candidates[rng.uniform_int(0, len(candidates) - 1)],
                     curr_y + 1)
                )
            curr_x = candidates[rng.uniform_int(0, len(candidates) - 1)]

        # reset() theming draws (climber.cpp:466-492)
        bg_index = rng.uniform_int(0, 48)
        bg_offset = rng.uniform_float()
        agent_theme = rng.uniform_int(0, 3)
        map_theme = rng.uniform_int(0, 3)
        return dict(
            difficulty=difficulty,
            num_platforms=num_platforms,
            grid=grid,
            mobs=mobs,
            crystals=crystals,
            bg_index=bg_index,
            bg_offset=bg_offset,
            agent_theme=agent_theme,
            map_theme=map_theme,
        )
    finally:
        rng.close()
