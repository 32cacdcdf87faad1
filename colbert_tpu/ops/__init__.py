from colbert_tpu.ops.maxsim import maxsim, maxsim_xla, maxsim_pallas, maxsim_qd

__all__ = ["maxsim", "maxsim_xla", "maxsim_pallas", "maxsim_qd"]
