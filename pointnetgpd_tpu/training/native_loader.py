"""ctypes binding + batcher for the native C++ data loader.

(native/loader/loader.cpp — the 32-process torch DataLoader replacement:
threaded .npy reads with a cloud cache, random grasp/view selection, and
fixed-shape batch assembly in C++.) Drop-in alternative to
``training.data.OneViewBatcher``; produces the same batch tuple the fused
train step consumes (labels computed host-side from the score columns).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .data import labels_from_scores

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "loader")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libloader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "loader.cpp")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                  ctypes.c_uint64, ctypes.c_int]
    lib.loader_add_object.restype = ctypes.c_int64
    lib.loader_add_object.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_char_p]
    lib.loader_next_batch.restype = ctypes.c_int
    lib.loader_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.loader_num_objects.restype = ctypes.c_int64
    lib.loader_num_objects.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeBatcher:
    """C++-backed batch source with the OneViewBatcher interface.

    Per sample: random object -> random grasp row + random view cloud,
    subsampled to ``cloud_points``. Labels/weights from the score columns
    exactly like training.data.labels_from_scores.
    """

    GRASP_COLS = 12

    def __init__(self, index, batch_size: int, cloud_points: int = 20000,
                 num_classes: int = 2, thresh_good: float = 0.6,
                 thresh_bad: float = 0.6, seed: int = 0,
                 n_threads: int = 0):
        lib = _load()
        self._lib = lib
        self._handle = lib.loader_create(cloud_points, self.GRASP_COLS,
                                         seed, n_threads)
        self.batch_size = batch_size
        self.cloud_points = cloud_points
        self.num_classes = num_classes
        self.thresh_good = thresh_good
        self.thresh_bad = thresh_bad
        self._batch_counter = 0

        n_ok = 0
        for obj in index.objects:
            cloud_obj = index.transform[obj][0]
            files = index.cloud_files.get(cloud_obj, [])
            if not files:
                continue
            rows = lib.loader_add_object(
                self._handle, index.grasp_files[obj].encode(),
                "\n".join(files).encode())
            if rows > 0:
                n_ok += 1
        if n_ok == 0:
            raise ValueError("no loadable objects")
        self._transforms = {
            obj: np.asarray(index.transform[obj][1], np.float32)
            for obj in index.objects
        }
        # the native loader samples objects internally; transforms are per
        # object, so keep an identity default and let the caller use the
        # pure-python batcher when per-object transforms differ. For the YCB
        # layout all transforms ride along in the grasp coordinates already
        # once collect_grasp_clouds applies them; here we pass identity and
        # expect pre-transformed grasp files (document at call sites).
        self._identity = np.tile(np.eye(4, dtype=np.float32),
                                 (batch_size, 1, 1))

    def next_batch(self):
        lib = self._lib
        b = self.batch_size
        grasps = np.zeros((b, self.GRASP_COLS), np.float32)
        clouds = np.zeros((b, self.cloud_points, 3), np.float32)
        scores = np.zeros((b, 2), np.float32)
        self._batch_counter += 1
        ret = lib.loader_next_batch(
            self._handle, b, self._batch_counter,
            grasps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            clouds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if ret == 1:
            raise RuntimeError("native loader has no objects")
        labels, weights = labels_from_scores(
            scores[:, 0], scores[:, 1], self.thresh_good, self.thresh_bad,
            self.num_classes)
        if ret == 2:  # some cloud loads failed: mask those samples
            dead = ~clouds.any(axis=(1, 2))
            weights = weights * (~dead).astype(np.float32)
        return grasps, clouds, self._identity, labels, weights

    def __iter__(self):
        return self

    def __next__(self):
        return self.next_batch()

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None
