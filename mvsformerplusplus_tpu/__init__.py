"""mvsformerplusplus_tpu — a TPU-native multi-view stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MVSFormer++
(reference: maybeLx/MVSFormerPlusPlus): cascade plane-sweep cost volumes over
calibrated multi-view images, transformer feature matching, frozen DINOv2
features, cross-entropy depth supervision, and geometric-consistency point
cloud fusion — all laid out for the MXU/VPU/HBM/ICI machine model:

- NHWC / NDHWC layouts, bf16 compute with fp32 islands for geometry;
- resizes and interpolation as separable matmuls (MXU) instead of gathers;
- plane-sweep warping as a fused coordinate-compute + 4-corner gather;
- attention via Pallas flash kernels with entropy-invariant softmax scale;
- multi-chip scaling via jax.sharding Mesh axes (data, cv): data-parallel
  batches over DCN/ICI and cost-volume source-view/depth partitioning with
  psum reduction over ICI.
"""

__version__ = "0.1.0"
