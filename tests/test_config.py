"""Global config singleton / API-key store / file backend / dotenv —
reference pandasai/config.py:10-58, helpers/filemanager.py:7-74,
helpers/env.py:6-14 parity.
"""

import os

import pytest


@pytest.fixture(autouse=True)
def _reset_config():
    from pandas_ai_spark.config import APIKeyManager, Config, ConfigManager

    yield
    ConfigManager._config = Config()
    APIKeyManager._api_key = None
    os.environ.pop("PANDABI_API_KEY", None)


class TestConfigManager:
    def test_set_replaces_and_get_returns(self):
        import pandas_ai_spark as pai

        pai.config.set({"max_retries": 5, "verbose": True})
        c = pai.config.get()
        assert c.max_retries == 5 and c.verbose is True
        assert c.save_logs is True  # untouched fields keep defaults

    def test_update_merges(self):
        from pandas_ai_spark.config import ConfigManager

        ConfigManager.set({"max_retries": 7})
        ConfigManager.update({"verbose": True})
        c = ConfigManager.get()
        assert c.max_retries == 7 and c.verbose is True

    def test_unknown_key_rejected(self):
        from pandas_ai_spark.config import ConfigManager

        with pytest.raises(TypeError):
            ConfigManager.set({"not_a_setting": 1})

    def test_global_defaults_flow_into_agent(self, spark):
        import pandas_ai_spark as pai
        from pandas_ai_spark.agent import Agent
        from pandas_ai_spark.agent.llm import FakeLLM

        fake = FakeLLM('result = {"type": "number", "value": 1}')
        pai.config.set({"max_retries": 9, "llm": fake})
        df = spark.createDataFrame([(1,)], ["a"])
        ag = Agent([df])
        assert ag.max_retries == 9
        assert ag.llm is fake
        # explicit kwargs still win over the global config
        ag2 = Agent([df], max_retries=2)
        assert ag2.max_retries == 2


class TestAPIKeyManager:
    def test_set_mirrors_env(self):
        import pandas_ai_spark as pai

        pai.api_key.set("pai-test-123")
        assert pai.api_key.get() == "pai-test-123"
        assert os.environ["PANDABI_API_KEY"] == "pai-test-123"


class TestFileManager:
    def test_default_roundtrip(self, tmp_path):
        from pandas_ai_spark.config import DefaultFileManager

        fm = DefaultFileManager(base_path=str(tmp_path))
        fm.mkdir("org/ds")
        fm.write("org/ds/schema.yaml", "name: x\n")
        assert fm.exists("org/ds/schema.yaml")
        assert fm.load("org/ds/schema.yaml") == "name: x\n"
        fm.write_binary("org/ds/blob.bin", b"\x00\x01")
        assert fm.load_binary("org/ds/blob.bin") == b"\x00\x01"
        assert fm.abs_path("a/b").startswith(str(tmp_path))

    def test_default_base_is_datasets_root(self, monkeypatch, tmp_path):
        from pandas_ai_spark.config import DefaultFileManager

        monkeypatch.setenv("PANDAS_AI_SPARK_DATA", str(tmp_path))
        assert DefaultFileManager().base_path == str(tmp_path)

    def test_config_carries_file_manager(self):
        from pandas_ai_spark.config import (Config, DefaultFileManager,
                                            FileManager)

        c = Config()
        assert isinstance(c.file_manager, FileManager)
        assert isinstance(c.file_manager, DefaultFileManager)


class TestLoadDotenv:
    def test_loads_nearest_without_override(self, tmp_path, monkeypatch):
        from pandas_ai_spark.config import load_dotenv

        nested = tmp_path / "a" / "b"
        nested.mkdir(parents=True)
        (tmp_path / ".env").write_text(
            "# comment\nNEW_KEY_R8='quoted value'\nKEPT_KEY=changed\n"
            "not a kv line\n")
        monkeypatch.setenv("KEPT_KEY", "original")
        monkeypatch.delenv("NEW_KEY_R8", raising=False)
        load_dotenv(start=str(nested))  # found by upward walk
        assert os.environ["NEW_KEY_R8"] == "quoted value"
        assert os.environ["KEPT_KEY"] == "original"
        os.environ.pop("NEW_KEY_R8", None)

    def test_missing_env_is_noop(self, tmp_path):
        from pandas_ai_spark.config import load_dotenv

        load_dotenv(start=str(tmp_path))  # no .env anywhere above tmp
