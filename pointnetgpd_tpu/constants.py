"""Framework-wide constants (reference: dex-net/src/dexnet/constants.py:22-43).

Values match the reference where downstream data depends on them
(NO_CONTACT_DIST feeds surface-window extraction; the file-extension and
tag strings appear in stored databases / processed-mesh caches).
"""

# grasp contact params
NO_CONTACT_DIST = 0.2   # stand-in distance for non-contact window rows
WIN_DIST_LIM = 0.02     # window plotting limits

# file extensions
HDF5_EXT = ".hdf5"
OBJ_EXT = ".obj"
OFF_EXT = ".off"
STL_EXT = ".stl"
SDF_EXT = ".sdf"
URDF_EXT = ".urdf"

# tags for intermediate files
DEC_TAG = "_dec"
PROC_TAG = "_proc"

# solver default max iterations
DEF_MAX_ITER = 100

# database access levels
READ_ONLY_ACCESS = "READ_ONLY"
READ_WRITE_ACCESS = "READ_WRITE"
