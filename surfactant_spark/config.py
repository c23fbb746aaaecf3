"""Sectioned configuration manager — the engine-settings analogue of
the reference's `surfactant/configmanager.py:10-120` (singleton per
app name, sectioned get/set with fallback, persisted config file).

JSON-backed instead of tomlkit (not in this sandbox); the API contract
(`tests/config/test_configmanager.py` semantics) is preserved:
one shared instance per app name, `get(section, option, fallback)`,
`set(...)` persists immediately, `cm[section]` mapping access, and
`delete_instance` for test isolation.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional


class ConfigManager:
    _instances: Dict[str, "ConfigManager"] = {}

    def __new__(cls, app_name: str = "surfactant_spark", config_dir: Optional[str] = None):
        if app_name not in cls._instances:
            inst = super().__new__(cls)
            inst._initialized = False
            cls._instances[app_name] = inst
        return cls._instances[app_name]

    def __init__(self, app_name: str = "surfactant_spark", config_dir: Optional[str] = None):
        if self._initialized:
            return
        self._initialized = True
        self.app_name = app_name
        base = config_dir or os.environ.get(
            "SPARK_GRAFT_CONFIG_DIR",
            os.path.join(tempfile.gettempdir(), "surfactant_spark_config"),
        )
        self.config_path = os.path.join(base, app_name, "config.json")
        self.config: Dict[str, Dict[str, Any]] = {}
        self._load()

    @classmethod
    def delete_instance(cls, app_name: str) -> None:
        cls._instances.pop(app_name, None)

    def _load(self) -> None:
        if os.path.exists(self.config_path):
            with open(self.config_path, encoding="utf-8") as f:
                self.config = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.config_path), exist_ok=True)
        with open(self.config_path, "w", encoding="utf-8") as f:
            json.dump(self.config, f, indent=2, sort_keys=True)

    def get(self, section: str, option: str, fallback: Any = None) -> Any:
        return self.config.get(section, {}).get(option, fallback)

    def set(self, section: str, option: str, value: Any) -> None:
        self.config.setdefault(section, {})[option] = value
        self._save()

    def __getitem__(self, section: str) -> Dict[str, Any]:
        return self.config.get(section, {})

    def data_dir_path(self) -> str:
        """Directory for CLI session state — the analogue of the
        reference's ``ConfigManager.get_data_dir_path`` that
        `cmd/cli_commands/cli_base.py` stores its working set under."""
        d = os.path.join(os.path.dirname(self.config_path), "data")
        os.makedirs(d, exist_ok=True)
        return d
