"""Arrays-only checkpoint codec: npz payload + JSON structure, no pickle.

The reference pickled its whole model dict INCLUDING compiled Theano
functions (``reference: SCFGP/SCFGP.py:296-310``); round 1/2 of this repo
replaced the compiled-code part (XLA compile cache does that job) but kept
raw pickle for the state dict — and loading an untrusted pickle executes
arbitrary code (SURVEY.md §5 checkpoint row asked for an arrays-only
format; VERDICT r2 item 9).  This module stores:

  * every array as a plain entry in one ``.npz`` archive (zip of ``.npy``),
  * the nesting structure as a JSON document (dicts/lists/tuples/
    NamedTuples/scalars) with ``{"__a__": i}`` placeholders for arrays,

so a checkpoint can be loaded with ``allow_pickle=False`` end to end.
NamedTuples are encoded by class NAME against an explicit registry of this
package's state types — unknown names fail loudly instead of executing
anything.  ``load_state`` auto-detects legacy pickle checkpoints by file
magic (zip = ``PK``) so pre-round-3 files keep loading (documented unsafe,
for back compat only).
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict, List, Tuple

import numpy as np

# -- NamedTuple registry ------------------------------------------------------


def _registry() -> Dict[str, type]:
    """Known state NamedTuples, resolved lazily (import cycles: model ->
    checkpoint -> model)."""
    from ..models.params import SCFGPParams
    from ..models.objective import Posterior
    from ..opt.optimizers import (AdadeltaState, AdamState, AdamaxState,
                                  MomentumState)
    from ..opt.fused_loop import FusedLoopState
    types = [SCFGPParams, Posterior, AdadeltaState, AdamState, AdamaxState,
             MomentumState, FusedLoopState]
    return {t.__name__: t for t in types}


# dtypes np.save handles without pickle; anything else (e.g. ml_dtypes
# bfloat16) is stored as float32 with its name tagged for round-trip.
def _storable(dtype) -> bool:
    try:
        return np.dtype(dtype).kind in "biufc" and np.dtype(dtype).itemsize > 0
    except TypeError:
        return False


def _encode(obj: Any, arrays: List[np.ndarray]) -> Any:
    """Recursively convert ``obj`` to a JSON-able structure, appending
    arrays to ``arrays``."""
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if hasattr(obj, "__array__") or isinstance(obj, np.ndarray):
        a = np.asarray(obj)
        if not _storable(a.dtype):
            tag = str(a.dtype)
            arrays.append(a.astype(np.float32))
            return {"__a__": len(arrays) - 1, "dtype": tag}
        arrays.append(a)
        return {"__a__": len(arrays) - 1}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        name = type(obj).__name__
        if name not in _registry():
            raise TypeError(
                f"checkpoint: unregistered NamedTuple {name!r} — add it to "
                "utils/checkpoint._registry")
        return {"__nt__": name,
                "items": [_encode(v, arrays) for v in obj]}
    if isinstance(obj, tuple):
        return {"__t__": [_encode(v, arrays) for v in obj]}
    if isinstance(obj, list):
        return [_encode(v, arrays) for v in obj]
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if not isinstance(k, str):
                raise TypeError(f"checkpoint: non-str dict key {k!r}")
            out[k] = _encode(v, arrays)
        return {"__d__": out}
    if isinstance(obj, (bytes, bytearray)):  # e.g. StableHLO payloads
        arrays.append(np.frombuffer(bytes(obj), np.uint8))
        return {"__a__": len(arrays) - 1, "dtype": "bytes"}
    raise TypeError(f"checkpoint: cannot encode {type(obj).__name__}")


def _decode(node: Any, arrays: Dict[str, np.ndarray]) -> Any:
    if node is None or isinstance(node, (bool, int, float, str)):
        return node
    if isinstance(node, list):
        return [_decode(v, arrays) for v in node]
    if isinstance(node, dict):
        if "__a__" in node:
            a = arrays[f"a{node['__a__']}"]
            tag = node.get("dtype")
            if tag == "bytes":
                return a.tobytes()
            if tag is not None:
                try:
                    import ml_dtypes  # noqa: F401 — registers bfloat16 etc.
                    return a.astype(np.dtype(tag))
                except (ImportError, TypeError):
                    return a  # keep the float32 fallback
            return a
        if "__nt__" in node:
            cls = _registry().get(node["__nt__"])
            if cls is None:
                raise ValueError(
                    f"checkpoint: unknown NamedTuple {node['__nt__']!r}")
            return cls(*[_decode(v, arrays) for v in node["items"]])
        if "__t__" in node:
            return tuple(_decode(v, arrays) for v in node["__t__"])
        if "__d__" in node:
            return {k: _decode(v, arrays) for k, v in node["__d__"].items()}
    raise ValueError(f"checkpoint: cannot decode node {node!r}")


# -- public API ---------------------------------------------------------------


def dumps_state(state: Any) -> bytes:
    """Serialize ``state`` (nested dict/list/tuple/NamedTuple/array/scalar/
    bytes) to the npz-archive bytes format.  No pickle anywhere."""
    arrays: List[np.ndarray] = []
    tree = _encode(state, arrays)
    meta = json.dumps({"format": "scfgp-ckpt-v1", "tree": tree})
    payload = {f"a{i}": a for i, a in enumerate(arrays)}
    payload["__meta__"] = np.frombuffer(meta.encode("utf-8"), np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    return buf.getvalue()


def loads_state(blob: bytes) -> Any:
    """Decode bytes produced by ``dumps_state``.  Loads with
    ``allow_pickle=False`` end to end — safe on untrusted input (worst
    case: a ValueError)."""
    if blob[:2] != b"PK":
        raise ValueError("not an scfgp npz checkpoint (bad magic)")
    with np.load(io.BytesIO(blob), allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if meta.get("format") != "scfgp-ckpt-v1":
            raise ValueError("not a scfgp checkpoint")
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return _decode(meta["tree"], arrays)


def save_state(path: str, state: Any) -> None:
    """Write ``state`` (nested dict/list/tuple/NamedTuple/array/scalar) as
    one npz archive with a JSON structure entry.  No pickle anywhere."""
    blob = dumps_state(state)
    with open(path, "wb") as f:  # atomic enough for single-writer use
        f.write(blob)


def load_state(path: str) -> Tuple[Any, str]:
    """Load a checkpoint; returns ``(state, fmt)`` with fmt in
    {"npz", "pickle"}.  npz loads with ``allow_pickle=False``; the pickle
    branch exists only for pre-round-3 checkpoints and is as unsafe as
    pickle always is — never load untrusted legacy files."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:2] == b"PK":
        return loads_state(blob), "npz"
    import pickle
    return pickle.loads(blob), "pickle"
