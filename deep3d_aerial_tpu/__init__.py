"""deep3d_aerial_tpu — TPU-native aerial multi-view-stereo + 3D reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Deep3D_Aerial pipeline (reference: /root/reference): COLMAP sparse-model
ingest + view selection, cascade plane-sweep MVS dense matching, multi-view
consistency fusion to point clouds, mesh reconstruction, and DSM rasters.

Subpackages
-----------
geometry  : camera conventions, projection algebra (canonical XrightYdown/Tcw)
sparse    : COLMAP model readers, view selection, scene blocking
io        : PFM / predef text / viewpair / PLY / MVS-interface / GeoTIFF codecs
models    : cascade MVS network zoo (casmvsnet, ucsnet, msrednet, adamvs)
ops       : Pallas + XLA kernels (plane-sweep warp, cost aggregation, ...)
fusion    : depth-map consistency check + 3D fusion
dsm       : DSM rasterization (point cloud / mesh sources)
mesh      : mesh reconstruction stage (C++ core)
parallel  : device-mesh sharding for inference + training
train     : losses, metrics, optimizers, checkpointing, datasets
pipeline  : end-to-end orchestrator + config
"""

__version__ = "0.1.0"
