from . import mathutils, rng, raycone
