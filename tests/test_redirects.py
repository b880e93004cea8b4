"""Redirect-chain resolution: chains, cycles, budget, missing-node terminals."""

from etherscan_contract_crawler_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, max_hops=16):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["src"]: r for r in resolve_redirects(df, max_hops=max_hops).collect()}


def test_chain_resolves_with_exact_hops(spark):
    # 5 -> 4 -> 3 -> 2 -> 1 -> 0 (0 has no out-edge)
    out = _resolve(spark, [(i, i - 1) for i in range(1, 6)])
    for src in range(1, 6):
        r = out[src]
        assert r["resolved"] and r["terminal_id"] == 0 and r["n_hops"] == src


def test_cycle_unresolved(spark):
    out = _resolve(spark, [(10, 11), (11, 10), (12, 10)])
    assert not out[10]["resolved"] and out[10]["terminal_id"] is None
    assert not out[11]["resolved"] and out[11]["n_hops"] is None
    assert not out[12]["resolved"]  # feeds into the cycle


def test_hop_budget(spark):
    # chain of length 20 exceeds max_hops=16; length 16 exactly fits
    edges = [(i, i - 1) for i in range(1, 21)]
    out = _resolve(spark, edges, max_hops=16)
    assert out[16]["resolved"] and out[16]["n_hops"] == 16
    assert not out[17]["resolved"]
    assert not out[20]["resolved"]


def test_terminal_is_any_node_without_out_edge(spark):
    # 7 -> 99 where 99 never appears as src: terminal even though "missing"
    out = _resolve(spark, [(7, 99)])
    assert out[7]["resolved"] and out[7]["terminal_id"] == 99 and out[7]["n_hops"] == 1
