"""Custom TPU ops (Pallas kernels).

Hot-path candidates identified in SURVEY.md §3.2: the GP gram/solve/KL chain
and the observation log-likelihood reduction.  The pure-XLA paths in
models/ are the correctness reference; Pallas kernels land here with
numerics tests against them.
"""
