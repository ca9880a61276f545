from .staging import read_staging  # noqa: F401
from .registry import load_contracts_dir  # noqa: F401
