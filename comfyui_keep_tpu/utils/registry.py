"""Name → object registries (reference: wm_basicsr/utils/registry.py:4-88).

The reference registers nn.Module classes; here registrations are arch
*namespaces* — objects (usually modules or small classes) exposing
`init(key, **cfg) -> params` and `apply(params, ...) -> out` pure functions.
"""
from typing import Any, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def register(self, obj: Any = None, *, name: Optional[str] = None, suffix: Optional[str] = None):
        if obj is None:  # decorator with kwargs
            def deco(o):
                self._register(name or o.__name__, o, suffix)
                return o
            return deco
        self._register(name or obj.__name__, obj, suffix)
        return obj

    def _register(self, name: str, obj: Any, suffix: Optional[str]):
        key = f"{name}_{suffix}" if suffix else name
        if key in self._obj_map:
            raise KeyError(f"'{key}' already registered in '{self._name}'")
        self._obj_map[key] = obj

    def get(self, name: str, suffix: str = "keep_tpu"):
        ret = self._obj_map.get(name)
        if ret is None:
            # suffix fallback, mirroring the reference registry semantics
            ret = self._obj_map.get(f"{name}_{suffix}")
        if ret is None:
            raise KeyError(f"'{name}' not found in '{self._name}' registry. "
                           f"Available: {sorted(self._obj_map)}")
        return ret

    def __contains__(self, name: str):
        return name in self._obj_map

    def __iter__(self):
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()


ARCH_REGISTRY = Registry("arch")
MODEL_REGISTRY = Registry("model")
DATASET_REGISTRY = Registry("dataset")
LOSS_REGISTRY = Registry("loss")
METRIC_REGISTRY = Registry("metric")
