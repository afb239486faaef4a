"""Console entry point (reference: bin/deepsolid).

Usage:
  deepsolid-tpu --config=path/to/config.py:ARGS [--config.key value ...]
  python -m deepsolid_tpu --config=...
"""

from absl import app, flags, logging
from ml_collections.config_flags import config_flags

from deepsolid_tpu import config as base_config
from deepsolid_tpu.train import process

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file("config", None, "Path to config file.")


def _main(_):
    cfg = base_config.resolve(FLAGS.config)
    logging.info("System config:\n%s", cfg)
    process.process(cfg)


def main():
    app.run(_main)


if __name__ == "__main__":
    main()
