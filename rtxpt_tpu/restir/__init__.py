from . import di, reservoir
