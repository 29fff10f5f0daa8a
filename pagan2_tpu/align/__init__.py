from .settings import AlignSettings, X_MAT, Y_MAT, M_MAT
from .oracle import PairAligner, PathPtr, MatrixPtr
from .ancestral import build_ancestral_graph


def align_pair(left, right, model, settings=None, left_branch_length=0.0,
               right_branch_length=0.0, is_reads_sequence=False,
               engine="auto", compute_consensus=False):
    """Align two sequence graphs and build the ancestral graph.

    engine: "oracle" (host loops, ground truth), "jax" (vectorized
    wavefront DP on device), or "auto" (jax, falling back to oracle).
    Returns (ancestral_graph, end_pointer).
    """
    settings = settings or AlignSettings()
    if is_reads_sequence:
        settings = settings.for_reads()

    path = None
    end = None
    if engine in ("jax", "auto"):
        try:
            ok = not (settings.pair_end_reads or settings.compute_full_score)
            from .viterbi_sheared import is_linear_chain, sheared_align_path
            if ok and is_linear_chain(left) and is_linear_chain(right):
                path, end = sheared_align_path(
                    left, right, model, settings,
                    left_branch_length, right_branch_length)
            else:
                from .viterbi_jax import jax_align_path
                path, end = jax_align_path(left, right, model, settings,
                                           left_branch_length,
                                           right_branch_length)
        except ImportError:
            if engine == "jax":
                raise

    if path is None:
        aligner = PairAligner(left, right, model, settings,
                              left_branch_length, right_branch_length)
        path, end = aligner.align()

    anc = build_ancestral_graph(left, right, path, model, settings,
                                left_branch_length, right_branch_length,
                                is_reads_sequence,
                                compute_consensus=compute_consensus)
    return anc, end
