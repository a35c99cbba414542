from vitvs_tpu.io_bridge.config import VSConfig, load_config

__all__ = ["VSConfig", "load_config"]
