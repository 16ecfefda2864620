"""Driver / orchestration layer (reference mainShapley.py + start.py).

Lazy re-exports (PEP 562): ``driver.start`` pulls jax and the full model
stack; importing it eagerly here would drag all of that into processes
that only need the leaf protocol module — most importantly the recycle
supervisor (driver/supervisor.py), a thin Popen+wait parent whose job is
bounding the service's RSS.
"""

_LAZY = {
    "start": "shapley_vit_tpu.driver.start",
    "get_initial_shapley_value": "shapley_vit_tpu.driver.start",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
