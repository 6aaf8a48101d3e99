"""Stable byte serialization for models and datasets.

The reference serializes with bincode behind ``dump()``/``load()``
(`src/python_bindings.rs:66-79,388-401,571-584`) and wires the same bytes into
the pickle protocol.  We keep the *API* (dump -> bytes, load <- bytes, full
pickle support) but use a versioned npz container instead of bincode —
SURVEY.md §5 records that byte-format compatibility is explicitly not
required, only API compatibility.
"""

from __future__ import annotations

import io
import json
from typing import Any, Dict, List, Tuple

import numpy as np

MAGIC = "ppca_rs_tpu"
VERSION = 1


def dump_bytes(kind: str, arrays: Dict[str, np.ndarray], meta: Dict[str, Any] | None = None) -> bytes:
    """Serialize named arrays + JSON-able metadata into stable bytes."""
    header = {
        "magic": MAGIC,
        "version": VERSION,
        "kind": kind,
        "meta": meta or {},
    }
    buf = io.BytesIO()
    np.savez(buf, __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8), **arrays)
    return buf.getvalue()


def load_bytes(data: bytes, expected_kind: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Inverse of :func:`dump_bytes`; validates the container kind."""
    buf = io.BytesIO(data)
    with np.load(buf, allow_pickle=False) as npz:
        header = json.loads(bytes(npz["__header__"].tobytes()).decode())
        if header.get("magic") != MAGIC:
            raise ValueError("not a ppca_rs_tpu serialized object")
        if header.get("kind") != expected_kind:
            raise ValueError(
                f"serialized object is a {header.get('kind')!r}, expected {expected_kind!r}"
            )
        arrays = {k: npz[k] for k in npz.files if k != "__header__"}
    return arrays, header.get("meta", {})
