"""Architecture explainer for the message-centered GNN decoder.

Counterpart of the reference's print-only walkthrough
(``examples/message_gnn_structure.py``), updated for the TPU-native design:
prints the actual shapes, groupings, and parameter tree for a small code.

Run:  PYTHONPATH=. python examples/message_gnn_structure.py
"""
import jax
import jax.numpy as jnp

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.message_gnn import create_message_gnn_decoder
from ldpc_tpu.ops import qc_msg


def main() -> None:
    bg = get_base_graph("toy_4x8")
    Z = 4
    qc = qc_layout(bg, Z)
    plan = qc_msg.make_plan(qc)

    print("=== Message-centered GNN over the QC edge layout ===\n")
    print("1. The Tanner graph's EDGES become GNN nodes ('messages').")
    print(f"   base graph {bg.shifts.shape}, Z={Z}: K={qc.num_base_edges} base edges")
    print(f"   -> {qc.num_edges} messages, stored as a (K={qc.num_base_edges}, Z={Z}) block grid\n")

    print("2. Two relations connect messages:")
    print("   - same-variable cliques (aggregated as per-variable means)")
    print("   - same-check cliques (aggregated as per-check means)")
    print("   The reference materializes these as dense ExE normalized")
    print("   adjacencies; on the QC layout they are an incidence matmul and")
    print("   a circulant-roll gather — no ExE matrix exists.\n")

    print(f"3. Weight sharing by message TYPE = circulant shift value:")
    print(f"   {plan.num_edge_types} types for this code; every Z-lifted copy of a")
    print("   base edge shares its type embedding.\n")

    model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan)
    print("4. Parameter tree (per-iteration layers, 2 iterations, hidden 16):")
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        print(f"   {name:70s} {tuple(leaf.shape)}")
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"   total: {total} parameters\n")

    print("5. Decode: embed LLRs -> N iterations of (type-emb + relation MLPs,")
    print("   residual skip from iter 2) -> project to per-message LLRs ->")
    print("   sum per variable + channel LLR -> sigmoid -> hard decision.")


if __name__ == "__main__":
    main()
