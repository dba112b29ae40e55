"""tpu-kquant: a TPU-native quantized GGUF inference engine.

A brand-new JAX/XLA/Pallas framework with the capability surface of the
reference stack surveyed in /root/repo/SURVEY.md (a NEON-optimized llama.cpp
quantized-inference engine): GGUF K-quant model loading (Q4_K_M superblocks,
Q8_K activations), a functional Llama/Mixtral forward, a slot-contiguous
(optionally INT8) KV cache, fused Pallas dequant+matmul kernels, continuous
batching, and GSPMD tensor/expert sharding over TPU meshes.

Layer map (reference layer -> here, see SURVEY.md section 1):
  L0 model I/O        -> tpu_kquant.gguf        (GGUF reader/writer, mmap views)
  L1 quant kernels    -> tpu_kquant.quant + tpu_kquant.ops (Pallas)
  L2+L3 sched/threads -> XLA (jit) -- no manual scheduler needed on TPU
  L4 graph builder    -> tpu_kquant.models      (traced functional forward)
  L5 context runtime  -> tpu_kquant.runtime + tpu_kquant.serving
  L6 tools/CLI        -> tpu_kquant.tools       (bench, perplexity, generate)
  L7 perf overlay     -> tpu_kquant.utils.roofline + docs
"""

__version__ = "0.1.0"
