from .io_utils import logging_ts, mkdir_p, read_text_file, write_yaml_file  # noqa: F401
