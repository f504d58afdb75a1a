from .base import Sketch
from .ddsketch import DDSketch
from .tdigest import TDigest

__all__ = ["Sketch", "DDSketch", "TDigest"]
