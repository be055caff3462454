"""Custom TPU kernels and the measured kernel-engineering design space.

This package holds hand-written Pallas kernels for paths where the XLA
lowering leaves performance on the table.  Round-1 measurements on v5e
(16384 Hex20 elements, q = 27, f32; see KERNELS.md for the full log):

=====================================  ==============  ====================
path                                    throughput      notes
=====================================  ==============  ====================
XLA einsum (assembly/local.py)          ~440-660 M el/s  ~90% f32 roofline;
                                                        fully fused, gp
                                                        never hits HBM
libCEED factorization A = Dᵀ(ĈD)        ~2.4 M el/s     T staging through
(XLA or Pallas outer matmul)                            HBM dominates
manual dot_general w/ staged gp         ~6.5 M el/s     transposes to HBM
Pallas batched 3x3 dots                 (compile blowup) Mosaic unrolls
                                                        per-batch tiny dots
=====================================  ==============  ====================

Conclusion: for batched small-tensor FEM contractions the **fused XLA
einsum is at roofline** and is the production path; hand-written kernels
must fuse the entire jacobian→gradient→contraction chain to compete, which
Mosaic currently compiles poorly for d=3-sized batched dots.  SpMV and
scatter measurements live in fenris_tpu/sparse (segment-sum with
argument-passed indices reaches ~1.2 TB/s effective; closure-constant
indices hit a ~1000x XLA:TPU slow path — see sparse/cg.py).

Pallas kernels will be (re)introduced here when profiling shows a real gap
(candidates: fused matrix-free operator apply with double-buffered element
streaming for meshes larger than HBM-resident gp buffers).
"""

__all__: list = []
