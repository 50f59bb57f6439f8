"""Mathematical operators (reference L2 layer, operators/__init__.py:37-119).

The reference exposes runtime-checkable Protocols (Preconditioner,
LinearOperator, PsiOperator) plus ``require_protocol`` enforcement at the
seams. We keep the same seams as plain Python protocols over *jittable*
callables — the concrete classes hold static configuration and expose pure
``dot``/``hdot`` functions suitable for jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class LinearOperator(Protocol):
    """Hermitian-symmetric linear operator on image cubes."""

    def dot(self, x): ...

    def hdot(self, x): ...


@runtime_checkable
class Preconditioner(Protocol):
    """Operator with an (approximate) inverse application."""

    def dot(self, x): ...

    def idot(self, x, **kw): ...


@runtime_checkable
class PsiOperator(Protocol):
    """Sparsity dictionary: analysis ``dot`` (image -> coeffs) and
    synthesis ``hdot`` (coeffs -> image)."""

    def dot(self, x): ...

    def hdot(self, alpha): ...


def require_protocol(obj, protocol: type, name: str = "operator") -> None:
    """Early seam validation (reference operators/__init__.py:97-119)."""
    if not isinstance(obj, protocol):
        missing = [m for m in getattr(protocol, "__protocol_attrs__", []) if not hasattr(obj, m)]
        raise TypeError(f"{name} ({type(obj).__name__}) does not satisfy {protocol.__name__}; missing attrs: {missing}")
