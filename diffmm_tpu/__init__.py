"""diffmm_tpu: a TPU-native JAX framework for multi-modal graph-diffusion
recommendation, with the full capability surface of the DiffMM reference
implementation (see SURVEY.md)."""

__version__ = "0.1.0"
