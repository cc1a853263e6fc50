from . import intersect, bvh, traverse
