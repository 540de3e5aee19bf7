from synthesis_in_style_tpu.core.triggers import IntervalTrigger, get_trigger
from synthesis_in_style_tpu.core.reporter import Reporter, get_current_reporter
from synthesis_in_style_tpu.core.trainer import Trainer
from synthesis_in_style_tpu.core.updater import Updater

__all__ = [
    "IntervalTrigger",
    "get_trigger",
    "Reporter",
    "get_current_reporter",
    "Trainer",
    "Updater",
]
