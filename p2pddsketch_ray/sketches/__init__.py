from .base import Sketch
from .ddsketch import DDSketch

__all__ = ["Sketch", "DDSketch"]
