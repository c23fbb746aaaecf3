"""Settings round-trip — the `tests/config/test_configmanager.py`
contract: singleton per app, set/get with fallback, mapping access,
persistence across instances."""

import pytest

from surfactant_spark.config import ConfigManager


@pytest.fixture
def cm(tmp_path):
    m = ConfigManager(app_name="testapp", config_dir=str(tmp_path))
    yield m
    ConfigManager.delete_instance("testapp")


def test_singleton(cm):
    assert ConfigManager(app_name="testapp") is cm


def test_set_get_and_fallback(cm):
    cm.set("Settings", "theme", "dark")
    assert cm.get("Settings", "theme") == "dark"
    assert cm.get("Settings", "missing", fallback="x") == "x"
    assert cm.get("NoSection", "opt") is None


def test_getitem(cm):
    cm.set("Settings", "theme", "dark")
    assert cm["Settings"]["theme"] == "dark"
    assert cm["Nothing"] == {}


def test_persistence_round_trip(cm, tmp_path):
    cm.set("core", "output_format", "cytrics")
    cm.set("core", "n", 7)
    ConfigManager.delete_instance("testapp")
    fresh = ConfigManager(app_name="testapp", config_dir=str(tmp_path))
    try:
        assert fresh.get("core", "output_format") == "cytrics"
        assert fresh.get("core", "n") == 7
    finally:
        ConfigManager.delete_instance("testapp")
