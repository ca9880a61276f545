from .enrich import (  # noqa: F401
    enrich_blocks,
    enrich_contracts,
    enrich_geth_traces,
    enrich_logs,
    enrich_prices,
    enrich_token_transfers,
    enrich_traces,
    enrich_transactions,
    new_tokens,
)
from .verify import (  # noqa: F401
    VerificationError,
    verify_have_latest,
    verify_root_traces_match_transactions,
)
