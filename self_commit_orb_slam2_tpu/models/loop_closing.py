"""Loop-closing phase: periodic place recognition + map correction.

TPU-native counterpart of the reference LoopClosing thread
(src/LoopClosing.cc:71-110 Run loop).  Stage status:

  v1 (this file, minimal): no-op placeholder invoked at the right pipeline
  point.  Next milestones add (reference call sequence): BoW loop detection
  (:133), Sim3 RANSAC + optimization (:337), loop correction with essential-
  graph optimization (:571), global bundle adjustment (:880).
"""

from __future__ import annotations

from .config import SlamConfig
from .map_state import MapState


class LoopCloser:
    def __init__(self, config: SlamConfig):
        self.config = config

    def process(self, m: MapState, kf_id) -> MapState:
        return m
