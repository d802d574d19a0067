"""Shim: the RPC fixture moved into the package (it now also backs the
driver-graded connector/HTTP-edge catalog queries)."""

from spectraplex_spark.testing.rpc_fixture import (  # noqa: F401
    OTHER,
    WALLET,
    FixtureNode,
    _sig,
    golden_tx,
    serve_node,
)
