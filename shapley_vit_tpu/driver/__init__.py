"""Driver / orchestration layer (reference mainShapley.py + start.py).

Deliberately import-light and re-export-free: ``driver.start`` pulls jax
and the full model stack, and eagerly importing it here would drag all of
that into processes that only need the leaf protocol module — most
importantly the recycle supervisor (driver/supervisor.py) and svt-status,
thin stdlib-only tools. Import entry points from their submodules
(``from shapley_vit_tpu.driver.start import start``); a package-level
lazy alias for the NAME ``start`` is impossible anyway — the submodule of
the same name shadows it on the package object as soon as anything
imports ``shapley_vit_tpu.driver.start``.
"""
