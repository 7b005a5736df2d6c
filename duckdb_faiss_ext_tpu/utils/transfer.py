"""Device→host result transfer helpers.

Fetching two arrays costs two round-trips on high-latency links (remote/
tunneled TPU runtimes); a search result is tiny (nq × k), so latency
dominates.  ``fetch_results`` packs (distances f32, positions i32) into one
(nq, 2k) **int32** buffer on device and performs a single host transfer,
then unpacks with numpy views.

The packing direction matters: the float distances are bitcast into the
int32 buffer, NOT the other way around.  Positions bitcast to float32 are
denormals/NaN payloads, and float transports may canonicalize NaNs or flush
denormals to zero (observed on the tunneled TPU runtime, silently zeroing
every position).  Integer buffers transfer bit-exactly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fetch_results(dist, pos):
    """(nq, k) f32 distances + (nq, k) i32 positions → numpy, one transfer."""
    k = dist.shape[1]
    if k == 0:
        return (np.asarray(dist), np.asarray(pos, dtype=np.int32))
    packed = jnp.concatenate(
        [jax.lax.bitcast_convert_type(dist, jnp.int32),
         pos.astype(jnp.int32)], axis=1)
    host = np.ascontiguousarray(np.asarray(packed))
    d = np.ascontiguousarray(host[:, :k]).view(np.float32)
    p = host[:, k:].copy()
    return d, p
