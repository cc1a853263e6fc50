from . import meshutils
