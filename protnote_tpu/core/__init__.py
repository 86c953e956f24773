from protnote_tpu.core.config import Config, load_config, override_config, get_setup
