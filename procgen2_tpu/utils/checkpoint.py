"""Checkpoint save/restore for env state pytrees.

The reference cannot checkpoint at all: env state lives in C++ globals
behind the CEnv ABI and is never exported (SURVEY.md §5 "Checkpoint /
resume"; the only reproducibility hook is reseeding on reset,
games/coinrun/coinrun.cpp:308-318). Here the entire environment state —
`EnvState` (per-game SoA pytrees + episode accumulators + PRNG keys) and
the level bank — is an explicit pytree, so checkpointing is exact:
serialize the leaves, restore them, and the continued trajectory is
bit-identical (tests/test_checkpoint.py proves it).

Format: a single compressed ``.npz`` holding every leaf under its
flattened state-dict path. JAX typed PRNG keys (``jax.random.key``) are
stored as their raw key data plus the impl name and re-wrapped on
restore. Restoring requires a *target* pytree of the same structure
(e.g. the live state, or one freshly built the same way) — the usual
"example tree" restore contract; no pickling, no custom classes in the
file, so checkpoints are portable across processes and hosts.

Usage::

    from procgen2_tpu.utils import checkpoint
    checkpoint.save("ckpt.npz", state=state, bank=bank)
    ...
    restored = checkpoint.restore("ckpt.npz", state=state, bank=bank)
    state, bank = restored["state"], restored["bank"]
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

_KEY_PREFIX = "__prngkey__"


def _is_typed_key(x) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _flatten(nested: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(nested, dict):
        for k, v in nested.items():
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    else:
        if _is_typed_key(nested):
            impl = str(jax.random.key_impl(nested))
            out[f"{_KEY_PREFIX}:{impl}:{prefix}"] = np.asarray(
                jax.random.key_data(nested)
            )
        else:
            out[prefix] = np.asarray(nested)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    nested: Dict[str, Any] = {}
    for path, arr in flat.items():
        value: Any = arr
        if path.startswith(_KEY_PREFIX + ":"):
            _, impl, path = path.split(":", 2)
            value = jax.random.wrap_key_data(jnp.asarray(arr), impl=impl)
        node = nested
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return nested


def save(path: str, **trees: Any) -> None:
    """Serialize named pytrees (``state=``, ``bank=``, ...) to ``path``.

    Each keyword becomes a top-level namespace in the archive, so a
    single file can hold the env state, the level bank, and anything
    else (optimizer state, rollout buffers) side by side.
    """
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        _flatten(serialization.to_state_dict(tree), name, flat)
    np.savez_compressed(path, **flat)


def restore(path: str, **targets: Any) -> Dict[str, Any]:
    """Load pytrees from ``path`` into the structure of ``targets``.

    ``targets`` supplies one example pytree per saved namespace (the
    live object, or a freshly constructed one of identical structure);
    returns a dict mapping each requested name to the restored pytree.
    Leaf dtype/shape mismatches raise (flax.serialization validates the
    state dict against the target).
    """
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    nested = _unflatten(flat)
    out: Dict[str, Any] = {}
    for name, target in targets.items():
        if name not in nested:
            raise KeyError(
                f"checkpoint {path!r} has no namespace {name!r}; "
                f"available: {sorted(nested)}"
            )
        restored = serialization.from_state_dict(target, nested[name])
        # from_state_dict keeps the target's leaf where the state dict
        # holds one (e.g. typed keys restored above); push everything
        # back to device arrays with the target's dtypes.
        out[name] = jax.tree.map(
            lambda t, r: r if _is_typed_key(r) else jnp.asarray(
                r, getattr(t, "dtype", None)
            ),
            target,
            restored,
        )
    return out
