"""Pallas TPU kernels (each with an XLA fallback at its call site):

* ``denoise_mlp`` — fused single-hidden denoiser forward (opt-in).
* ``spmm_dual``   — both dense propagation directions in one adjacency pass
  (opt-in; measured a wash vs two XLA matmuls at tiktok shapes).
* ``segsum``      — sorted segment-sum via one-hot MXU matmuls, the sparse
  graph form's SpMM reduction (auto, host-planned).
"""


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return -(-x // m) * m
