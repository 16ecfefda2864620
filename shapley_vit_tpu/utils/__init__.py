"""Observability utilities: structured/CSV logging and running-average
meters (reference shapleyserver/utils/)."""

from shapley_vit_tpu.utils.logging import CSVLogger, get_logger  # noqa: F401
from shapley_vit_tpu.utils.metrics import AverageMeter, AverageMeterList  # noqa: F401
