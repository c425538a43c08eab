from .state import StreamState, pick_bucket, pad_chunk, DEFAULT_BUCKETS
from .engine import LiveInferEngine
from .batch_engine import BatchedStreamScorer
