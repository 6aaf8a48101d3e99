"""Randomness plumbing.

The reference uses `rand::thread_rng` (nondeterministic, implicit) everywhere —
e.g. `ppca/src/utils.rs:7-25` (`standard_noise{,_matrix}`) and the samplers in
`ppca/src/ppca_model.rs:164-191,603-626`.  JAX randomness is explicit and
keyed.  We bridge the two worlds:

* every sampling entry point accepts an optional ``key=`` argument
  (``jax.random.PRNGKey``-style) for deterministic, reproducible use;
* when ``key`` is omitted, a process-global key chain (seeded from OS entropy,
  re-seedable with :func:`seed`) supplies fresh keys, mimicking the
  reference's implicit-RNG ergonomics.
"""

from __future__ import annotations

import secrets
import threading
from typing import Optional

import jax


class _GlobalKeyChain:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._key = None

    def seed(self, value: int) -> None:
        with self._lock:
            self._key = jax.random.PRNGKey(value)

    def next_key(self):
        with self._lock:
            if self._key is None:
                self._key = jax.random.PRNGKey(secrets.randbits(63))
            self._key, sub = jax.random.split(self._key)
            return sub


_chain = _GlobalKeyChain()


def seed(value: int) -> None:
    """Seed the process-global RNG used when no explicit ``key`` is passed."""
    _chain.seed(value)


def ensure_key(key: Optional[jax.Array]):
    """Return ``key`` if given, else advance and return the global key chain."""
    if key is None:
        return _chain.next_key()
    return key
