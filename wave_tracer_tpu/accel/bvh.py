"""Host-side binary BVH build (binned SAH), flattened to arrays.

Replaces the reference's vendored tinybvh SAH builder
(reference src/ads/bvh_constructor.cpp:15-31,157). The output is a flat SoA
node array consumable by the JAX traversal kernels: children are adjacent
(right = left + 1) and leaves reference a contiguous range of a reordered
triangle permutation. The reference tunes for "very deep trees" for cone
traversal; here depth is capped so per-lane traversal stacks stay small.

An optimized C++ builder (accel/native) can replace this numpy implementation
for very large scenes; the array layout is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_DEPTH = 30


@dataclass
class FlatBVH:
    node_min: np.ndarray    # (N, 3) f32
    node_max: np.ndarray    # (N, 3) f32
    node_left: np.ndarray   # (N,) i32 — internal: left child (right=left+1); leaf: first tri
    node_count: np.ndarray  # (N,) i32 — 0 internal, >0 leaf triangle count
    tri_order: np.ndarray   # (T,) i32 permutation into the original tri arrays

    @property
    def num_nodes(self):
        return len(self.node_min)

    def depth(self) -> int:
        d = {0: 0}
        best = 0
        stack = [0]
        while stack:
            i = stack.pop()
            if self.node_count[i] == 0:
                l = self.node_left[i]
                d[l] = d[l + 1] = d[i] + 1
                best = max(best, d[l])
                stack += [l, l + 1]
        return best


NATIVE_THRESHOLD = 4096   # use the C++ builder above this triangle count


def build_bvh(positions: np.ndarray, max_leaf: int = 4,
              n_bins: int = 16) -> FlatBVH:
    """Binned-SAH binary BVH over triangle soup positions (T, 3, 3).

    Large scenes build through the native C++ kernel (native/) when the
    toolchain is available; the array layout is identical either way.
    """
    T = len(positions)
    if T > NATIVE_THRESHOLD:
        from wave_tracer_tpu import native
        out = native.build_bvh_native(positions, max_leaf)
        if out is not None:
            return out
    if T == 0:
        return FlatBVH(np.zeros((1, 3), np.float32),
                       np.zeros((1, 3), np.float32),
                       np.zeros(1, np.int32), np.zeros(1, np.int32),
                       np.zeros(0, np.int32))
    tmin = positions.min(axis=1).astype(np.float64)
    tmax = positions.max(axis=1).astype(np.float64)
    cent = 0.5 * (tmin + tmax)

    order = np.arange(T, dtype=np.int64)
    node_min, node_max, node_left, node_count = [], [], [], []

    def new_node():
        node_min.append(None)
        node_max.append(None)
        node_left.append(0)
        node_count.append(0)
        return len(node_min) - 1

    root = new_node()
    # work stack: (node_idx, start, end, depth)
    stack = [(root, 0, T, 0)]
    while stack:
        ni, s, e, depth = stack.pop()
        ids = order[s:e]
        bmin = tmin[ids].min(axis=0)
        bmax = tmax[ids].max(axis=0)
        node_min[ni] = bmin
        node_max[ni] = bmax
        n = e - s
        if n <= max_leaf or depth >= MAX_DEPTH:
            node_left[ni] = s
            node_count[ni] = n
            continue

        # binned SAH over the best axis
        c = cent[ids]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] <= 1e-12:
            # all centroids identical: split in half
            mid = s + n // 2
        else:
            scale = n_bins * (1.0 - 1e-7) / ext[axis]
            bidx = ((c[:, axis] - cmin[axis]) * scale).astype(np.int64)
            # per-bin bounds + counts
            counts = np.bincount(bidx, minlength=n_bins)
            binmin = np.full((n_bins, 3), np.inf)
            binmax = np.full((n_bins, 3), -np.inf)
            np.minimum.at(binmin, bidx, tmin[ids])
            np.maximum.at(binmax, bidx, tmax[ids])
            # prefix/suffix areas
            def areas(mn, mx):
                d = np.maximum(mx - mn, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
            lmin = np.minimum.accumulate(binmin, axis=0)
            lmax = np.maximum.accumulate(binmax, axis=0)
            rmin = np.minimum.accumulate(binmin[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(binmax[::-1], axis=0)[::-1]
            lcnt = np.cumsum(counts)
            rcnt = np.cumsum(counts[::-1])[::-1]
            cost = np.full(n_bins - 1, np.inf)
            la = areas(lmin, lmax)[:-1]
            ra = areas(rmin, rmax)[1:]
            valid = (lcnt[:-1] > 0) & (rcnt[1:] > 0)
            cost[valid] = (la * lcnt[:-1] + ra * rcnt[1:])[valid]
            best = int(np.argmin(cost))
            if not np.isfinite(cost[best]):
                mid = s + n // 2
            else:
                sel = bidx <= best
                # partition preserving relative order
                left_ids = ids[sel]
                right_ids = ids[~sel]
                order[s:s + len(left_ids)] = left_ids
                order[s + len(left_ids):e] = right_ids
                mid = s + len(left_ids)
                if mid == s or mid == e:
                    mid = s + n // 2

        li = new_node()
        ri = new_node()
        assert ri == li + 1
        node_left[ni] = li
        node_count[ni] = 0
        stack.append((ri, mid, e, depth + 1))
        stack.append((li, s, mid, depth + 1))

    return FlatBVH(
        node_min=np.asarray(node_min, np.float32),
        node_max=np.asarray(node_max, np.float32),
        node_left=np.asarray(node_left, np.int32),
        node_count=np.asarray(node_count, np.int32),
        tri_order=order.astype(np.int32),
    )
