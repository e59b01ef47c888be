from .dataset import create_forward_loop, get_dataset_batches
from .evaluate import lm_cross_entropy, perplexity, synthetic_token_batches
from .logging_utils import print_rank_0, warn_rank_0
from .perf import AccumulatingTimer, MemoryMonitor, Timer, device_memory_stats
from .random import named_key, seed_everything
from .tracking import start_run

__all__ = [
    "AccumulatingTimer",
    "MemoryMonitor",
    "Timer",
    "create_forward_loop",
    "device_memory_stats",
    "get_dataset_batches",
    "lm_cross_entropy",
    "named_key",
    "perplexity",
    "print_rank_0",
    "seed_everything",
    "start_run",
    "synthetic_token_batches",
    "warn_rank_0",
]
