"""autourdf_tpu — TPU-native unsupervised robot modeling from point clouds.

A ground-up JAX/XLA/Pallas rebuild of the AutoURDF pipeline
(arXiv 2412.05507): multi-frame point-cloud cluster registration,
motion-based link discovery, kinematic-tree + joint estimation, link
meshing, and URDF emission — designed for TPU from the start (static
shapes, fused scans, Pallas kernels for the Chamfer/ICP/k-means hot path,
sequence-parallel sharding over device meshes).
"""

__version__ = "0.1.0"
