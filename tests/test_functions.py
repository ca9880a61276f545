"""Scalar function family: keccak vectors, topics normalization,
hash-bucket stability, selector/unhex helpers."""

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.functions.evm import (
    hash_bucket,
    topics_arr,
    trace_selector,
    unhex_0x,
)
from datawaves_etl_airflow_spark.functions.keccak import keccak256_hex


class TestKeccak:
    def test_empty(self):
        assert keccak256_hex(b"") == (
            "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        )

    def test_abc(self):
        assert keccak256_hex(b"abc") == (
            "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        )

    def test_transfer_signature(self):
        # the ERC-20 Transfer topic0 — the D-1 predicate constant
        assert keccak256_hex(b"Transfer(address,address,uint256)") == (
            "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
        )

    def test_pad_len_one_135_bytes(self):
        # 135-byte input → pad_len == 1 → single 0x81 pad byte branch
        out = keccak256_hex(b"a" * 135)
        assert len(out) == 64
        # differs from the 134- and 136-byte digests (branch actually ran)
        assert out != keccak256_hex(b"a" * 134)
        assert out != keccak256_hex(b"a" * 136)

    def test_multi_block(self):
        # > 136 bytes exercises multi-block absorption
        assert len(keccak256_hex(b"x" * 1000)) == 64


class TestTopicsArr:
    """The three wire shapes (reference evm_load_template.py:231-236)."""

    def _run(self, spark, values):
        df = spark.createDataFrame([(v,) for v in values], ["topics"])
        return [
            r[0] for r in df.select(topics_arr(F.col("topics"))).collect()
        ]

    def test_three_shapes(self, spark):
        json_arr = '["0xaa","0xbb","0xcc"]'
        comma = "0xaa,0xbb,0xcc"
        single = "0xaa"
        out = self._run(spark, [json_arr, comma, single])
        assert out[0] == ["0xaa", "0xbb", "0xcc"]
        assert out[1] == ["0xaa", "0xbb", "0xcc"]
        assert out[2] == ["0xaa"]

    def test_quoted_comma_shape(self, spark):
        # comma-joined with stray quotes is cleaned by replace()
        out = self._run(spark, ['0xaa,"0xbb"'])
        assert out[0] == ["0xaa", "0xbb"]


class TestHashBucket:
    def test_pinned_murmur3_values(self, spark):
        """Bucket values must reproduce Spark's Murmur3 exactly — the
        on-disk decode-pruning layout depends on them (SURVEY.md §4)."""
        df = spark.createDataFrame(
            [("0xaa",), ("0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef",)],
            ["v"],
        )
        got = [r[0] for r in df.select(hash_bucket(F.col("v"))).collect()]
        # pin against spark's own hash() so any engine upgrade that
        # changes hashing fails loudly
        expected = [
            r[0]
            for r in df.select((F.abs(F.hash(F.col("v"))) % 10)).collect()
        ]
        assert got == expected
        assert all(0 <= b < 10 for b in got)

    def test_stability_across_runs(self, spark):
        df = spark.createDataFrame([("stable-key",)], ["v"])
        a = df.select(hash_bucket(F.col("v"))).collect()[0][0]
        b = df.select(hash_bucket(F.col("v"))).collect()[0][0]
        assert a == b


class TestSelectorsAndUnhex:
    def test_trace_selector(self, spark):
        df = spark.createDataFrame(
            [("0xa9059cbb" + "00" * 64,), ("0x",)], ["input"]
        )
        out = [
            r[0] for r in df.select(trace_selector(F.col("input"))).collect()
        ]
        assert out[0] == "0xa9059cbb"
        assert out[1] == "0x"

    def test_unhex_0x(self, spark):
        df = spark.createDataFrame([("0x0a1b",), ("0x",)], ["d"])
        out = [r[0] for r in df.select(unhex_0x(F.col("d"))).collect()]
        assert out[0] == bytes([0x0A, 0x1B])
        assert out[1] == b""
