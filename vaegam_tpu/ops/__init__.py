"""Custom TPU ops.

Where the time actually goes (measured on a v5e chip, batch 32; see the
perf-pass commits):

  * full train step .......... ~37 ms
  * decoder convs fwd+bwd .... ~30 ms  (memory-bound: XLA reports 3.5 GB
                                        accessed fwd / 11.7 GB bwd; achieved
                                        ~400 GB/s of the chip's ~819 GB/s)
  * encoder  ................. ~4 ms
  * ENTIRE GP bank (grams, solves, posterior, KL, BxB gain Choleskys):
    0.9 ms in-step (37.8 vs 36.9 ms with the GP stubbed out) — XLA already
    fuses the tiny-tensor math to near-zero inside the jitted step.

Consequences for kernel work:
  * BASELINE.json floated "GP RBF-gram/Cholesky/KL path fused via Pallas" —
    measurement says that path is 2.4% of the step; a Pallas fusion is
    decoration, not engineering, so it was deliberately not built.
  * The hot op is the small-channel (8/16ch) 3D transposed-conv stack.  Two
    polyphase reformulations (convt.py) were built and benchmarked SLOWER
    than XLA's native lhs_dilation lowering (see networks.py note); a fully
    VMEM-fused decoder kernel is the remaining headroom (~2x step) and is
    tracked as future work — it must fuse across the batch-stat norms, whose
    global reductions force a two-pass structure.
"""

from . import convt  # noqa: F401
