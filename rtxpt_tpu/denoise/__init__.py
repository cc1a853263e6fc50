from . import relax
