from . import accumulation, tonemap
