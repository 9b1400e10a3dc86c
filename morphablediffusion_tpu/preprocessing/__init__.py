"""Offline host-side preprocessing (dataset preparation).

Reproduces the reference's preprocessing contracts
(preprocessing/facescape/, preprocessing/thuman/ — SURVEY.md D7/D8) with a
self-contained dependency story: depth rendering runs through the native C++
rasterizer (native/rasterizer.cpp) instead of pyrender/EGL, mesh IO through
utils.mesh_io instead of trimesh/openmesh, and fan-out through
multiprocessing with optional mpi4py.
"""
