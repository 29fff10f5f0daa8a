"""Device->host array fetch with zero-copy fast path.

On the CPU backend np.from_dlpack aliases the device buffer directly
(saving a full copy of the backpointer planes — the largest readback on
every batched launch); on TPU or when dlpack refuses, fall back to the
plain copying np.asarray. Results are read-only views; callers only
index them."""
import numpy as np


def fetch_np(x) -> np.ndarray:
    try:
        return np.from_dlpack(x)
    except Exception:
        return np.asarray(x)
