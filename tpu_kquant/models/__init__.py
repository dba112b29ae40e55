"""Model family layer: configs + functional forwards (llama family, MoE)."""

from tpu_kquant.models.config import ModelConfig  # noqa: F401
from tpu_kquant.models.llama import llama_forward  # noqa: F401
