"""Async texture cache.

The reference loads textures asynchronously on a taskflow thread pool
with source-path dedup (donut/src/engine/TextureCache.cpp:
LoadTextureFromFileAsync, donut/include/donut/engine/TextureCache.h:127)
so decode overlaps scene-graph import and accel-structure builds. Here
decode jobs run on a host ThreadPoolExecutor while geometry flattening,
BVH/dense builds and device uploads proceed; consumers resolve the
futures only where texel data is actually needed (texture-stack build,
OMM alpha bake)."""
from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Hashable, Optional


class TextureCache:
    """Thread-pool decode with key dedup (one job per unique source)."""

    def __init__(self, max_workers: int = 8):
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._jobs: dict = {}

    def submit(self, key: Optional[Hashable], fn: Callable) -> Future:
        if key is not None and key in self._jobs:
            return self._jobs[key]
        fut = self._pool.submit(fn)
        if key is not None:
            self._jobs[key] = fut
        return fut

    def shutdown(self):
        self._pool.shutdown(wait=False)


def resolve_image(x):
    """Future -> decoded array; decoded arrays pass through."""
    return x.result() if isinstance(x, Future) else x


def resolve_images(images):
    """Join a (possibly mixed futures/arrays) image list in place-order."""
    if not images:
        return images
    return [resolve_image(x) for x in images]
