"""Jitted array ops: the TPU-native compute substrate.

Every op here is a pure function over fixed-shape arrays with validity masks.
Dynamic-size concepts from the reference (variable points per frame, variable
masks per image, growing point clouds) are expressed as fixed-capacity padded
buffers; neighbor queries (KD-tree / FAISS in the reference) are expressed as
sort + searchsorted over packed voxel keys.
"""
