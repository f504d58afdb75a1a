"""p2pddsketch_ray: a Ray-Data-native distributed sketch / approximate-
aggregation engine with the query capabilities of gmorleo/p2pDDSketch.

Centerpiece: DDSketch (relative-error quantile sketch) built via
``map_batches`` over zero-copy Arrow batches and merged through
groupby-aggregate tree merges -- the reference's P2P gossip topology
(/root/reference/main.cpp:475-658, graph.cpp) is replaced by explicit Ray
Data shuffle/merge stages.  Alongside: HyperLogLog, count-min, Bloom, KLL,
MinHash/SimHash, dedup, text analysis, and ANN similarity-search pipelines.
"""

from .config import SketchConfig
from .sketches import DDSketch

__all__ = ["DDSketch", "SketchConfig"]
__version__ = "0.1.0"
