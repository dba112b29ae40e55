"""Runtime: GGUF loader, KV cache, jitted inference engine."""

from tpu_kquant.runtime.engine import InferenceEngine  # noqa: F401
from tpu_kquant.runtime.kv_cache import KVCache  # noqa: F401
from tpu_kquant.runtime.loader import load_model  # noqa: F401
