from .tiles import resolve_tile_collisions, tile_at, aabb_overlap
from .aabb import check_collision
