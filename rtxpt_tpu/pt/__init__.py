from . import bsdf
