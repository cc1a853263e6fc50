from . import build, camera, procedural, types
