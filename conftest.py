# Make the in-tree package importable without installation (no-network env).
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
