"""Layered properties configuration.

Counterpart of config/ConfigProvider.java:16-84: defaults <- optional
config file (Java .properties format) <- environment/system overrides.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_DEFAULTS = {
    "TimebasedId.DeploymentContext": "0",
    "Memory.LowPercThreshold": "0.1",
}


def _parse_properties(text: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(("#", "!")):
            continue
        for sep in ("=", ":"):
            if sep in line:
                k, _, v = line.partition(sep)
                out[k.strip()] = v.strip()
                break
    return out


class Config:
    def __init__(self, values: Optional[Dict[str, str]] = None):
        self._values = dict(_DEFAULTS)
        if values:
            self._values.update(values)

    @classmethod
    def from_file(cls, path: Optional[str] = None) -> "Config":
        cfg = cls()
        if path and os.path.exists(path):
            with open(path) as f:
                cfg._values.update(_parse_properties(f.read()))
        # environment overrides (system-property analogue)
        for k in list(cfg._values):
            env_key = "CMS_" + k.replace(".", "_")
            if env_key in os.environ:
                cfg._values[k] = os.environ[env_key]
        return cfg

    def get(self, key: str, default: Optional[str] = None) -> Optional[str]:
        return self._values.get(key, default)

    def get_int(self, key: str, default: int = 0) -> int:
        v = self.get(key)
        return int(v) if v is not None else default

    def get_float(self, key: str, default: float = 0.0) -> float:
        v = self.get(key)
        return float(v) if v is not None else default

    def put(self, key: str, value: str) -> None:
        self._values[key] = value
