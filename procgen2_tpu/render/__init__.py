from . import atlas, compositor
