from colbert_tpu.ops.maxsim import maxsim, maxsim_xla, maxsim_pallas

__all__ = ["maxsim", "maxsim_xla", "maxsim_pallas"]
