from .staging import STAGING_SCHEMAS, staging_schema  # noqa: F401
from .abi import (  # noqa: F401
    AbiElement,
    AbiInput,
    abi_element_schema,
    solidity_to_spark_type,
)
