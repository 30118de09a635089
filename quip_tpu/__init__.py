"""quip_tpu: a TPU-native framework for QuIP-style 2–4 bit LLM quantization.

Re-implements, TPU-first (JAX/XLA/Pallas/GSPMD), the full capability surface of
the Cornell-RelaxML/QuIP reference (arXiv 2307.13304):

  * adaptive rounding with LDLQ / LDLQ-RG / greedy ("allbal") / LDL-ADMM / OPTQ
  * incoherence processing (diagonal rescale + random orthogonal butterflies)
  * per-layer Hessian calibration over decoder LMs (OPT / Llama / BLOOM)
  * perplexity + zero-shot evaluation harness
  * packed int2/3/4 inference with fused Pallas dequant-matmul kernels
  * GSPMD-sharded multi-chip serving

The compute path is pure JAX; nothing here imports torch.
"""

__version__ = "0.1.0"

from quip_tpu.quantize.config import QuantConfig, PreprocConfig  # noqa: F401
from quip_tpu.quantize.pipeline import quantize_layer  # noqa: F401
