"""Driver / orchestration layer (reference mainShapley.py + start.py)."""

from shapley_vit_tpu.driver.start import start, get_initial_shapley_value  # noqa: F401
