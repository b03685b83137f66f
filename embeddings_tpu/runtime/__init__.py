from .engine import Engine, load_model
from .batching import BatchPlan, pad_batch, pick_bucket, plan_batches

__all__ = ["Engine", "load_model", "BatchPlan", "pad_batch", "pick_bucket",
           "plan_batches"]
