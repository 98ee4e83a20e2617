from .tree import tree_select
