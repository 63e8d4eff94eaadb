"""Custom TPU ops.

Where the time actually goes (measured on a v5e chip, batch 32; see the
perf-pass commits):

  * full train step .......... ~37 ms
  * decoder convs fwd+bwd .... ~30 ms
  * encoder  ................. ~4 ms
  * ENTIRE GP bank (grams, solves, posterior, KL, BxB gain Choleskys):
    0.9 ms in-step (37.8 vs 36.9 ms with the GP stubbed out) — XLA already
    fuses the tiny-tensor math to near-zero inside the jitted step.

Consequences for kernel work (round-2 measurements; full story in
docs/PERFORMANCE.md "Why the decoder is NOT memory-bound"):
  * BASELINE.json floated "GP RBF-gram/Cholesky/KL path fused via Pallas" —
    measurement says that path is 2.4% of the step; a Pallas fusion is
    decoration, not engineering, so it was deliberately not built.
  * The hot op is the small-channel (8/16ch) 3D transposed-conv stack.  It
    is MXU-STRUCTURE-bound, not memory-bound: each conv contracts only
    ic*27 = 216-432 elements with oc = 8-16 output channels against the
    MXU's 128x128 tiles (<=12% lane utilization), so the bound is how the
    tiny contraction maps onto the systolic array, not HBM traffic.  Two
    polyphase reformulations (convt.py) were built and benchmarked SLOWER
    than XLA's native lhs_dilation lowering (see networks.py note), and a
    VMEM-fused Pallas decoder was prototyped and DROPPED: it inherits the
    same MXU mapping and cannot beat XLA here (the round-1 "~2x headroom"
    estimate assumed a memory-bound decoder and was falsified by the r2
    bandwidth study).  The productive lever that survived measurement is
    precision (bf16 convs) + batch width (the fused 9B decode), both
    shipped in models/networks.py.
"""

from . import convt  # noqa: F401
