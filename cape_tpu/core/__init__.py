from cape_tpu.core.config import CAPEConfig, load_config, parse_cli
