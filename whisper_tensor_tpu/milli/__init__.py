from .ir import EvalCancelled, MilliGraph, MilliNode, MilliObserver, MilliOp, Phase

__all__ = ["MilliGraph", "MilliNode", "MilliOp", "MilliObserver", "Phase", "EvalCancelled"]
