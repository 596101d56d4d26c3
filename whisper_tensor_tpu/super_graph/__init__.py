from .cache import SuperGraphCache, SuperGraphTensorCache
from .graph import ExecutionContext, SuperGraph, SuperObserver
from .links import AudioClip, Image, LinkKind, MultimodalItem, SuperLink
from . import nodes

__all__ = ["SuperGraph", "ExecutionContext", "SuperObserver",
           "SuperGraphCache", "SuperGraphTensorCache",
           "LinkKind", "SuperLink", "Image", "AudioClip", "MultimodalItem",
           "nodes"]
