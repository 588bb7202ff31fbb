"""Device (JAX/Pallas) kernels + batched read-rescoring ops.

The TPU compute path: f32 log-space screening for the Poisson-binomial
significance test, batched banded BAQ forward/backward HMM, batched Viterbi
realignment.  Exact confirmation happens on host (lofreq_tpu.core/native).
"""
