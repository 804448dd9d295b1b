"""pcseg_tpu — TPU-native point-cloud segmentation framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
``seokjuchung/point-cloud-cnn-segmentation`` (reference:
``point_cloud_segmentation.py``): per-point semantic segmentation of ragged
particle-physics point clouds, plus a voxelize -> 3D U-Net -> devoxelize
north-star path with Pallas kernels and ICI data parallelism.

Layout
------
- ``core``     : configs, PRNG helpers
- ``parallel`` : device mesh, sharding specs, collectives (the DataParallel
                 replacement — reference pcs.py:209-213)
- ``data``     : HDF5 event reader, ragged->static batching, class stats,
                 host prefetch (reference pcs.py:20-63, 146-203)
- ``ops``      : kernel layer — fused pointwise MLP blocks, batchnorm,
                 masked losses/metrics, voxelize/devoxelize, conv3d, sparse
- ``models``   : PointNetSeg (reference pcs.py:65-133), VoxelUNet3d
- ``train``    : optimizer, jitted train/eval steps, epoch driver
                 (reference pcs.py:135-396)
- ``ckpt``     : checkpoint save/restore + ``best_model.pth`` importer
                 (reference pcs.py:371-382, 398-432)
"""

__version__ = "0.1.0"
