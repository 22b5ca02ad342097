"""Command-line interface.

Mirrors the reference CLI surface (reference vamb/__main__.py:2186-2811):
subcommands `bin {default,taxvamb,avamb}`, `taxometer`, `recluster`,
`taxonomy_benchmark`, with the same flag names and defaults. Thread caps are
applied before numpy import, as in the reference (:36-40).
"""

import argparse
import os
import sys

# Cap threadpools before numpy/jax import (reference __main__.py:36-40)
for _var in ("MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS"):
    os.environ.setdefault(_var, str(min(os.cpu_count() or 1, 8)))


def _enable_compile_cache() -> None:
    """Persist compiled XLA programs across CLI invocations.

    Every stage compiles a handful of fixed-shape programs (TNF projection,
    per-batch-size training epochs, the clustering engine and its compaction
    ladder); on TPU a cold compile costs tens of seconds, so re-runs and
    stage-cached restarts should never pay it twice."""
    try:
        import jax

        cache_dir = os.environ.get(
            "VAMB_TPU_COMPILE_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "vamb_tpu_jax_cache",
            ),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

import time
from functools import partial
from pathlib import Path

DEFAULT_THREADS = min(os.cpu_count() or 1, 8)


def add_help_arguments(parser):
    helpos = parser.add_argument_group(title="Help and version")
    helpos.add_argument("-h", "--help", help="Show this help and exit", action="help")

    from . import __version__

    helpos.add_argument(
        "--version", action="version", version=f"vamb_tpu {__version__}"
    )


def add_general_arguments(subparser):
    add_help_arguments(subparser)
    reqos = subparser.add_argument_group(title="Output")
    reqos.add_argument(
        "--outdir",
        metavar="",
        type=Path,
        help="Directory to create and write results into",
        required=True,
    )
    general = subparser.add_argument_group(title="General optional arguments")
    general.add_argument(
        "-m",
        dest="minlength",
        metavar="",
        type=int,
        default=2000,
        help="Drop contigs below this length in bp [2000]",
    )
    general.add_argument(
        "-p",
        dest="nthreads",
        metavar="",
        type=int,
        default=DEFAULT_THREADS,
        help=f"Thread count for host-side parallel stages [{DEFAULT_THREADS}]",
    )
    general.add_argument(
        "--norefcheck",
        help="Do not verify that input files agree on contig identifiers [False]",
        action="store_true",
    )
    general.add_argument(
        "--cuda",
        help="Ignored (accelerator use is automatic on TPU)",
        action="store_true",
    )
    general.add_argument(
        "--seed",
        metavar="",
        type=int,
        default=int.from_bytes(os.urandom(7), "little"),
        help="Seed for all random streams (bit-determinism not guaranteed across platforms)",
    )
    general.add_argument(
        "--profile",
        help="Write a jax.profiler device trace to outdir/profile [False]",
        action="store_true",
    )
    dist = subparser.add_argument_group(
        title="Multi-host (TPU pods / multi-node)"
    )
    dist.add_argument(
        "--dist",
        help="Initialize jax.distributed with pod/cluster auto-detection; "
        "launch the same command on every host [False]",
        action="store_true",
    )
    dist.add_argument(
        "--coordinator",
        metavar="",
        type=str,
        default=None,
        help="Coordinator address host:port (explicit multi-process launch; "
        "requires --nprocs and --procid)",
    )
    dist.add_argument(
        "--nprocs",
        metavar="",
        type=int,
        default=None,
        help="Total number of processes in the explicit multi-process launch",
    )
    dist.add_argument(
        "--procid",
        metavar="",
        type=int,
        default=None,
        help="This process's id (0-based) in the explicit launch",
    )
    return subparser


def _maybe_init_distributed(args) -> None:
    """Wire `jax.distributed` before any backend use (SURVEY §2.3 target).

    Auto mode (`--dist`) lets TPU pods discover topology from the
    environment; the explicit triple serves generic multi-node launches.
    Every process then sees the global device set, `pipeline.default_mesh`
    spans it, and `run()` gates output writing on process 0.
    """
    nprocs = getattr(args, "nprocs", None)
    auto = getattr(args, "dist", False)
    procid = getattr(args, "procid", None)
    coordinator = getattr(args, "coordinator", None)
    if not auto and nprocs is None:
        if procid is not None or coordinator is not None:
            # fail fast: a forgotten --nprocs would otherwise run N
            # independent single-process pipelines that clobber each
            # other's outputs in the shared --outdir
            raise SystemExit(
                "--procid/--coordinator require --nprocs (explicit "
                "multi-process launch) or --dist (auto-detection)"
            )
        return
    if nprocs is not None and procid is None:
        raise SystemExit("--nprocs requires --procid (and usually --coordinator)")

    from .parallel import distributed_init

    distributed_init(
        coordinator_address=getattr(args, "coordinator", None),
        num_processes=nprocs,
        process_id=getattr(args, "procid", None),
        auto=auto and nprocs is None,
    )


def add_composition_arguments(subparser):
    tnfos = subparser.add_argument_group(title="Composition input")
    tnfos.add_argument("--fasta", metavar="", type=Path, help="Contig catalogue as FASTA (optionally gzip/bzip2/xz)")
    tnfos.add_argument(
        "--composition", metavar="", type=Path, help="Reuse a composition.npz from a previous run"
    )
    return subparser


def add_abundance_arguments(subparser):
    abundanceos = subparser.add_argument_group(title="Abundance input")
    abundanceos.add_argument(
        "--bamfiles",
        dest="bampaths",
        metavar="",
        type=Path,
        help=argparse.SUPPRESS,
        nargs="+",
    )
    abundanceos.add_argument(
        "--bamdir", metavar="", type=Path, help="Directory of BAM files mapped against the contig catalogue"
    )
    abundanceos.add_argument(
        "--abundance_tsv",
        metavar="",
        type=Path,
        help='Precomputed abundance TSV; header must read "contigname(\\t<samplename>)*"',
    )
    abundanceos.add_argument(
        "--abundance",
        metavar="",
        dest="abundancepath",
        type=Path,
        help="Reuse an abundance.npz from a previous run",
    )
    abundanceos.add_argument(
        "-z",
        dest="min_alignment_id",
        metavar="",
        type=float,
        default=None,
        help=argparse.SUPPRESS,
    )
    return subparser


def add_bin_output_arguments(subparser):
    bin_os = subparser.add_argument_group(title="Bin output options")
    bin_os.add_argument(
        "--minfasta",
        dest="min_fasta_output_size",
        metavar="",
        type=int,
        default=None,
        help="Write bins of at least this many bp as FASTA [None = skip FASTA output]",
    )
    bin_os.add_argument(
        "--compress",
        dest="compress_fasta_output",
        help="gzip the emitted bin FASTAs (.fna.gz)",
        action="store_true",
    )
    bin_os.add_argument(
        "-o",
        dest="binsplit_separator",
        metavar="",
        type=str,
        default=None,
        const="",
        nargs="?",
        help="Separator for splitting bins by sample of origin [C when present; '' disables]",
    )
    return subparser


def add_vae_arguments(subparser):
    vaeos = subparser.add_argument_group(title="VAE options")
    vaeos.add_argument(
        "-n", dest="nhiddens", metavar="", type=int, nargs="+", default=None,
        help=argparse.SUPPRESS,
    )
    vaeos.add_argument(
        "-l", dest="nlatent", metavar="", type=int, default=32,
        help=argparse.SUPPRESS,
    )
    vaeos.add_argument(
        "-a", dest="alpha", metavar="", type=float, default=None,
        help=argparse.SUPPRESS,
    )
    vaeos.add_argument(
        "-b", dest="beta", metavar="", type=float, default=200.0,
        help=argparse.SUPPRESS,
    )
    vaeos.add_argument(
        "-d", dest="dropout", metavar="", type=float, default=None,
        help=argparse.SUPPRESS,
    )
    # TPU-build extension: bf16 matmuls (f32 master weights/stats) for VAE
    # training; encode-time latents stay exact f32 either way.
    vaeos.add_argument(
        "--precision", metavar="", type=str, default="f32",
        choices=("f32", "bf16"), help=argparse.SUPPRESS,
    )
    trainos = subparser.add_argument_group(title="Training options")
    trainos.add_argument(
        "-e", dest="nepochs", metavar="", type=int, default=300,
        help=argparse.SUPPRESS,
    )
    trainos.add_argument(
        "-t", dest="batchsize", metavar="", type=int, default=256,
        help=argparse.SUPPRESS,
    )
    trainos.add_argument(
        "-q", dest="batchsteps", metavar="", type=int, nargs="*",
        default=[25, 75, 150, 225], help=argparse.SUPPRESS,
    )
    trainos.add_argument(
        "-r", dest="lrate", metavar="", type=float, default=None,
        help=argparse.SUPPRESS,
    )
    return subparser


def add_taxonomy_arguments(subparser, taxonomy_only=False):
    taxonomys = subparser.add_argument_group(title="Taxonomy input")
    taxonomys.add_argument(
        "--taxonomy", metavar="", type=Path, help="Taxonomy TSV (contigs + predictions[ + scores])"
    )
    if not taxonomy_only:
        taxonomys.add_argument(
            "--no_predictor",
            help="Use the taxonomy as given instead of refining it with Taxometer first [False]",
            action="store_true",
        )
    return subparser


def add_predictor_arguments(subparser):
    pred_trainos = subparser.add_argument_group(
        title="Training options for the taxonomy predictor"
    )
    pred_trainos.add_argument(
        "-pe", dest="pred_nepochs", metavar="", type=int, default=100,
        help=argparse.SUPPRESS,
    )
    pred_trainos.add_argument(
        "-pt", dest="pred_batchsize", metavar="", type=int, default=1024,
        help=argparse.SUPPRESS,
    )
    pred_trainos.add_argument(
        "-pthr", dest="pred_softmax_threshold", metavar="", type=float,
        default=0.5, help=argparse.SUPPRESS,
    )
    pred_trainos.add_argument(
        "-ploss", dest="ploss", metavar="", type=str,
        choices=["flat_softmax", "cond_softmax", "soft_margin"],
        default="flat_softmax", help=argparse.SUPPRESS,
    )
    return subparser


def add_clustering_arguments(subparser):
    clusto = subparser.add_argument_group(title="Clustering options")
    clusto.add_argument(
        "-w", dest="window_size", metavar="", type=int, default=300,
        help=argparse.SUPPRESS,
    )
    clusto.add_argument(
        "-u", dest="min_successes", metavar="", type=int, default=15,
        help=argparse.SUPPRESS,
    )
    clusto.add_argument(
        "-c", dest="max_clusters", metavar="", type=int, default=None,
        help=argparse.SUPPRESS,
    )
    clusto.add_argument(
        "--distance_dtype", metavar="", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help=argparse.SUPPRESS,
    )
    clusto.add_argument(
        "--wander_kernel", metavar="", type=str, default="auto",
        choices=["auto", "pallas", "xla"],
        help=argparse.SUPPRESS,
    )
    clusto.add_argument(
        "--wander_scope", metavar="", type=str, default="auto",
        choices=["auto", "subset", "full"],
        help=argparse.SUPPRESS,
    )
    return subparser


def add_aae_arguments(subparser):
    aaeos = subparser.add_argument_group(title="AAE options")
    aaeos.add_argument(
        "--n_aae", dest="nhiddens_aae", metavar="", type=int, default=547,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--z_aae", dest="nlatent_aae_z", metavar="", type=int, default=283,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--y_aae", dest="nlatent_aae_y", metavar="", type=int, default=700,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--sl_aae", dest="sl", metavar="", type=float, default=0.00964,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--slr_aae", dest="slr", metavar="", type=float, default=0.5,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--aae_temp", dest="temp", metavar="", type=float, default=0.1596,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--e_aae", dest="nepochs_aae", metavar="", type=int, default=70,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--t_aae", dest="batchsize_aae", metavar="", type=int, default=256,
        help=argparse.SUPPRESS,
    )
    aaeos.add_argument(
        "--q_aae", dest="batchsteps_aae", metavar="", type=int, nargs="*",
        default=[25, 50], help=argparse.SUPPRESS,
    )
    return subparser


def _general_options_from_args(args):
    from .pipeline import GeneralOptions

    return GeneralOptions(
        outdir=args.outdir,
        min_contig_length=args.minlength,
        nthreads=args.nthreads,
        refcheck=not args.norefcheck,
        seed=args.seed,
        profile=args.profile,
    )


def _comp_options_from_args(args):
    from .pipeline import CompositionOptions

    return CompositionOptions(fasta=args.fasta, composition=args.composition)


def _abundance_options_from_args(args):
    from .pipeline import AbundanceOptions

    bampaths = args.bampaths
    if getattr(args, "bamdir", None) is not None:
        if bampaths is not None:
            raise ValueError("Cannot pass both --bamfiles and --bamdir")
        bampaths = sorted(args.bamdir.glob("*.bam"))
        if not bampaths:
            raise ValueError(f"No .bam files found in {args.bamdir}")
    minid = args.min_alignment_id
    if minid is not None and bampaths is None:
        raise ValueError(
            "If minid is set, abundance must be computed from bam files"
        )
    return AbundanceOptions(
        bampaths=bampaths,
        abundance_tsv=args.abundance_tsv,
        abundancepath=args.abundancepath,
        min_alignment_id=0.0 if minid is None else minid,
    )


def _vae_options_from_args(args):
    from .pipeline import VAEOptions

    if args.lrate is not None:
        raise ValueError(
            "The -r/--lrate flag is accepted for compatibility but has no "
            "effect: training uses the learning-rate-free D-Adaptation Adam"
        )
    return VAEOptions(
        nhiddens=args.nhiddens,
        nlatent=args.nlatent,
        alpha=args.alpha,
        beta=args.beta,
        dropout=args.dropout,
        nepochs=args.nepochs,
        batchsize=args.batchsize,
        batchsteps=list(args.batchsteps),
        precision=getattr(args, "precision", "f32"),
    )


def _cluster_options_from_args(args):
    from .pipeline import ClusterOptions

    return ClusterOptions(
        window_size=args.window_size,
        min_successes=args.min_successes,
        max_clusters=args.max_clusters,
        distance_dtype=args.distance_dtype,
        wander_kernel=args.wander_kernel,
        wander_scope=args.wander_scope,
    )


def _output_options_from_args(args):
    from .pipeline import BinOutputOptions
    from .utils import BinSplitter

    return BinOutputOptions(
        binsplitter=BinSplitter(args.binsplit_separator),
        min_fasta_output_size=args.min_fasta_output_size,
        compress_fasta_output=args.compress_fasta_output,
    )


def run(runner, general) -> None:
    """Create outdir, set up logging, run with timing (reference :702-715).

    Multi-process runs (--dist / --nprocs) are SPMD: every process executes
    the identical pipeline (the host-side control flow must run everywhere
    to drive the global-mesh device programs), so their outputs would be
    identical copies. Only process 0's land in the user's outdir; other
    processes write into a scratch subdirectory that is removed on success.
    """
    from . import __version__
    from .log import logger, setup_logging
    from .parallel import process_info

    begintime = time.time()
    proc_id, nprocs = process_info()
    scratch_outdir = None
    if proc_id != 0:
        scratch_outdir = general.outdir / f".proc{proc_id}"
        general.outdir = scratch_outdir
    general.outdir.mkdir(parents=True, exist_ok=True)
    setup_logging(general.outdir)
    logger.info(f"Starting vamb_tpu version {__version__}")
    logger.info("Random seed is " + str(general.seed))
    logger.info(f"Invoked with CLI args: '{' '.join(sys.argv)}'")
    if nprocs > 1:
        logger.info(f"Multi-host: process {proc_id} of {nprocs}")
    if getattr(general, "profile", False):
        import jax

        trace_dir = str(general.outdir / "profile")
        logger.info(f"Writing jax.profiler trace to {trace_dir}")
        with jax.profiler.trace(trace_dir):
            runner()
    else:
        runner()
    elapsed = round(time.time() - begintime, 2)
    logger.info(f"Completed vamb_tpu in {elapsed} seconds.")
    if scratch_outdir is not None:
        import shutil

        shutil.rmtree(scratch_outdir, ignore_errors=True)


def main(argv=None) -> None:
    doc = """vamb_tpu — TPU-native metagenomic binning.

    Default use, good for most datasets:
    vamb_tpu bin default --outdir out --fasta my_contigs.fna --abundance_tsv abundance.tsv"""
    parser = argparse.ArgumentParser(
        prog="vamb_tpu",
        description=doc,
        formatter_class=argparse.RawDescriptionHelpFormatter,
        add_help=False,
    )
    add_help_arguments(parser)

    args_in = sys.argv[1:] if argv is None else argv
    if len(args_in) == 0:
        parser.print_help()
        sys.exit()

    subparsers = parser.add_subparsers(dest="subcommand")

    bin_parser = subparsers.add_parser(
        "bin", help="Train a model and cluster its latent space into bins", add_help=False
    )
    add_help_arguments(bin_parser)
    subparsers_model = bin_parser.add_subparsers(dest="model_subcommand")

    vae_parser = subparsers_model.add_parser(
        "default",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="composition+abundance VAE binner (the flagship path)",
        add_help=False,
        usage="%(prog)s [options]",
        description="""The default binner: a VAE embeds each contig's TNF composition and
per-sample abundance into a latent space, which the medoid engine clusters into bins.

Requires --outdir, one composition input and one abundance input.""",
    )
    add_general_arguments(vae_parser)
    add_composition_arguments(vae_parser)
    add_abundance_arguments(vae_parser)
    add_bin_output_arguments(vae_parser)
    add_vae_arguments(vae_parser)
    add_clustering_arguments(vae_parser)

    vaevae_parser = subparsers_model.add_parser(
        "taxvamb",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="semi-supervised bi-modal VAE binner guided by taxonomy",
        add_help=False,
        usage="%(prog)s [options]",
        description="""TaxVamb: a semi-supervised bi-modal VAE trained on composition, abundance
and (possibly Taxometer-refined) taxonomy labels; the joint latent space is clustered into bins.

Requires --outdir, --taxonomy, one composition input and one abundance input.""",
    )
    add_general_arguments(vaevae_parser)
    add_composition_arguments(vaevae_parser)
    add_abundance_arguments(vaevae_parser)
    add_taxonomy_arguments(vaevae_parser)
    add_bin_output_arguments(vaevae_parser)
    add_vae_arguments(vaevae_parser)
    add_clustering_arguments(vaevae_parser)
    add_predictor_arguments(vaevae_parser)

    vaeaae_parser = subparsers_model.add_parser(
        "avamb",
        help=argparse.SUPPRESS,
        add_help=False,
        usage="%(prog)s [options]",
    )
    add_general_arguments(vaeaae_parser)
    add_composition_arguments(vaeaae_parser)
    add_abundance_arguments(vaeaae_parser)
    add_bin_output_arguments(vaeaae_parser)
    add_vae_arguments(vaeaae_parser)
    add_aae_arguments(vaeaae_parser)
    add_clustering_arguments(vaeaae_parser)

    predict_parser = subparsers.add_parser(
        "taxometer",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="refine classifier taxonomy with composition+abundance signal",
        add_help=False,
        usage="%(prog)s [options]",
        description="""Taxometer: train a predictor on composition+abundance features to refine
(and score) the taxonomy assigned by any upstream classifier.

Requires --outdir, --taxonomy, one composition input and one abundance input.""",
    )
    add_general_arguments(predict_parser)
    add_composition_arguments(predict_parser)
    add_abundance_arguments(predict_parser)
    add_taxonomy_arguments(predict_parser, taxonomy_only=True)
    add_predictor_arguments(predict_parser)

    validate_parser = subparsers.add_parser(
        "taxonomy_benchmark",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="k-fold benchmark of taxonomy prediction quality",
        add_help=False,
        usage="%(prog)s [options]",
        description="""k-fold cross-validated benchmark of taxonomy prediction quality on this dataset.

Requires --outdir, --taxonomy, one composition input and one abundance input.""",
    )
    add_general_arguments(validate_parser)
    add_composition_arguments(validate_parser)
    add_abundance_arguments(validate_parser)
    add_taxonomy_arguments(validate_parser, taxonomy_only=True)
    add_predictor_arguments(validate_parser)

    recluster_parser = subparsers.add_parser(
        "recluster",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="marker-gene-guided refinement of an existing binning",
        add_help=False,
        usage="%(prog)s [options]",
        description="""Refine an existing binning using single-copy marker genes: split bins with
duplicated markers via seeded K-means, or re-cluster per genus via DBSCAN.

Required arguments:
  K-means algorithm: Outdir, at least one composition input, at least one marker gene input,
    latent path and clusters path
  DBScan algorithm: also requires a taxonomy input""",
    )
    add_general_arguments(recluster_parser)
    add_composition_arguments(recluster_parser)
    add_abundance_arguments(recluster_parser)
    marker_s = recluster_parser.add_argument_group(title="Marker gene input")
    marker_s.add_argument(
        "--markers", metavar="", type=Path, help="Reuse a markers.npz from a previous run"
    )
    marker_s.add_argument(
        "--hmm_path", metavar="", type=Path,
        help="HMMER3 .hmm profile database of single-copy marker genes",
    )
    add_bin_output_arguments(recluster_parser)
    reclusters = recluster_parser.add_argument_group(
        title="K-means reclustering arguments"
    )
    reclusters.add_argument(
        "--latent_path", metavar="", type=Path,
        help="latent.npz emitted by a previous bin run",
    )
    reclusters.add_argument(
        "--clusters_path", metavar="", type=Path,
        help="Cluster TSV emitted by a previous bin run",
    )
    reclusters.add_argument(
        "--algorithm", metavar="", type=str, default="kmeans",
        choices=["kmeans", "dbscan"],
        help="Refinement algorithm: 'kmeans' or 'dbscan' [kmeans]",
    )
    add_predictor_arguments(recluster_parser)
    add_taxonomy_arguments(recluster_parser)

    ensemble_parser = subparsers.add_parser(
        "avamb_ensemble",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="merge CheckM2-scored binnings into one non-overlapping bin set",
        add_help=False,
        usage="%(prog)s [options]",
        description="""Merge multiple binnings (e.g. Avamb's vae/z/y cluster files) into one
non-redundant, non-overlapping bin set using CheckM2 scores: quality
filtering, score-based dereplication of near-duplicate bins, and overlap
ripping (the decision stages of the reference's workflow_avamb Snakemake).
Bin qualities come from a CheckM2 quality_report.tsv, or natively from
single-copy marker genes (--markers / --hmm_path) with no external tools.

Required arguments: outdir, a composition input, >=1 cluster TSVs, and one
quality source (--quality_report, --markers, or --hmm_path).""",
    )
    add_general_arguments(ensemble_parser)
    add_composition_arguments(ensemble_parser)
    ens = ensemble_parser.add_argument_group(title="Ensemble input/output")
    ens.add_argument(
        "--clusters", metavar="", type=Path, nargs="+",
        help="Paths to cluster TSV files (bin names must be unique across files)",
    )
    ens.add_argument(
        "--quality_report", metavar="", type=Path,
        help="CheckM2 quality_report.tsv covering every input bin",
    )
    ens.add_argument(
        "--markers", metavar="", type=Path,
        help="Marker .npz file for native bin scoring (alternative to "
        "--quality_report)",
    )
    ens.add_argument(
        "--hmm_path", metavar="", type=Path,
        help="Marker-gene .hmm profiles: predict markers from the FASTA "
        "input, then score bins natively",
    )
    ens.add_argument(
        "--write_bins", action="store_true",
        help="Also write per-sample FASTA files and a quality_report.tsv "
        "for the final bins (requires --fasta input)",
    )
    ens.add_argument(
        "--compress", dest="compress_fasta_output", action="store_true",
        help="Compress written bin FASTAs to .fna.gz",
    )
    ens.add_argument(
        "-o", dest="binsplit_separator", metavar="", type=str,
        default=None, const="", nargs="?",
        help="Sample separator for per-sample bin folders "
        "[C if present] (pass empty string to disable)",
    )
    ens.add_argument(
        "--min_completeness", metavar="", type=float, default=0.9,
        help="Min completeness (0-1) to keep a bin [0.9]",
    )
    ens.add_argument(
        "--max_contamination", metavar="", type=float, default=0.05,
        help="Max contamination (0-) to keep a bin [0.05]",
    )
    ens.add_argument(
        "--min_cov", metavar="", type=float, default=0.75,
        help="Overlap fraction of the smaller bin at which two bins are "
        "duplicates [0.75]",
    )
    ens.add_argument(
        "--min_bin_size", metavar="", type=int, default=200_000,
        help="Min bin size in bp to enter dereplication [200000]",
    )

    args = parser.parse_args(args_in)
    _maybe_init_distributed(args)

    if args.subcommand == "bin":
        model = args.model_subcommand
        if model is None:
            bin_parser.print_help()
            sys.exit(1)
        if model == "default":
            from .pipeline import BinDefaultOptions, run_bin_default

            general = _general_options_from_args(args)
            opt = BinDefaultOptions(
                general=general,
                comp=_comp_options_from_args(args),
                abundance=_abundance_options_from_args(args),
                vae=_vae_options_from_args(args),
                clustering=_cluster_options_from_args(args),
                output=_output_options_from_args(args),
            )
            run(partial(run_bin_default, opt), general)
        elif model == "taxvamb":
            from .pipeline import (
                BinTaxVambOptions,
                TaxometerOptions,
                run_vaevae,
            )

            if args.taxonomy is None:
                raise ValueError("bin taxvamb requires --taxonomy")
            general = _general_options_from_args(args)
            taxometer = None
            if not args.no_predictor:
                taxometer = TaxometerOptions(
                    taxonomy_path=args.taxonomy,
                    nepochs=args.pred_nepochs,
                    batchsize=args.pred_batchsize,
                    softmax_threshold=args.pred_softmax_threshold,
                    ploss=args.ploss,
                )
            opt = BinTaxVambOptions(
                general=general,
                comp=_comp_options_from_args(args),
                abundance=_abundance_options_from_args(args),
                vae=_vae_options_from_args(args),
                clustering=_cluster_options_from_args(args),
                output=_output_options_from_args(args),
                taxonomy_path=args.taxonomy,
                no_predictor=args.no_predictor,
                taxometer=taxometer,
                ploss=args.ploss,
            )
            run(partial(run_vaevae, opt), general)
        elif model == "avamb":
            from .pipeline import AAEOptions, BinAvambOptions, run_bin_aae

            general = _general_options_from_args(args)
            opt = BinAvambOptions(
                general=general,
                comp=_comp_options_from_args(args),
                abundance=_abundance_options_from_args(args),
                vae=_vae_options_from_args(args),
                aae=AAEOptions(
                    nhiddens=args.nhiddens_aae,
                    nlatent_z=args.nlatent_aae_z,
                    nlatent_y=args.nlatent_aae_y,
                    sl=args.sl,
                    slr=args.slr,
                    temp=args.temp,
                    nepochs=args.nepochs_aae,
                    batchsize=args.batchsize_aae,
                    batchsteps=list(args.batchsteps_aae),
                ),
                clustering=_cluster_options_from_args(args),
                output=_output_options_from_args(args),
            )
            run(partial(run_bin_aae, opt), general)
    elif args.subcommand == "taxometer":
        from .pipeline import (
            TaxometerOptions,
            TaxometerRunOptions,
            run_taxonomy_predictor,
        )

        if args.taxonomy is None:
            raise ValueError("taxometer requires --taxonomy")
        general = _general_options_from_args(args)
        opt = TaxometerRunOptions(
            general=general,
            comp=_comp_options_from_args(args),
            abundance=_abundance_options_from_args(args),
            taxometer=TaxometerOptions(
                taxonomy_path=args.taxonomy,
                nepochs=args.pred_nepochs,
                batchsize=args.pred_batchsize,
                softmax_threshold=args.pred_softmax_threshold,
                ploss=args.ploss,
            ),
        )
        run(partial(run_taxonomy_predictor, opt), general)
    elif args.subcommand == "taxonomy_benchmark":
        from .pipeline import (
            TaxometerOptions,
            TaxometerRunOptions,
            run_taxonomy_cross_validation,
        )

        if args.taxonomy is None:
            raise ValueError("taxonomy_benchmark requires --taxonomy")
        general = _general_options_from_args(args)
        opt = TaxometerRunOptions(
            general=general,
            comp=_comp_options_from_args(args),
            abundance=_abundance_options_from_args(args),
            taxometer=TaxometerOptions(
                taxonomy_path=args.taxonomy,
                nepochs=args.pred_nepochs,
                batchsize=args.pred_batchsize,
                softmax_threshold=args.pred_softmax_threshold,
                ploss=args.ploss,
            ),
        )
        run(partial(run_taxonomy_cross_validation, opt), general)
    elif args.subcommand == "recluster":
        from .pipeline import (
            MarkerOptions,
            ReclusteringOptions,
            TaxometerOptions,
            run_reclustering,
        )

        general = _general_options_from_args(args)
        comp = _comp_options_from_args(args)
        abundance = None
        try:
            abundance = _abundance_options_from_args(args)
        except ValueError:
            pass  # abundance only needed for dbscan-with-predictor
        taxometer = None
        if args.taxonomy is not None and not args.no_predictor:
            taxometer = TaxometerOptions(
                taxonomy_path=args.taxonomy,
                nepochs=args.pred_nepochs,
                batchsize=args.pred_batchsize,
                softmax_threshold=args.pred_softmax_threshold,
                ploss=args.ploss,
            )
        opt = ReclusteringOptions(
            general=general,
            comp=comp,
            markers=MarkerOptions(
                markers_path=args.markers,
                hmm_path=args.hmm_path,
                fasta_path=args.fasta,
            ),
            output=_output_options_from_args(args),
            latent_path=args.latent_path,
            algorithm=args.algorithm,
            clusters_path=args.clusters_path,
            taxonomy_path=args.taxonomy,
            no_predictor=args.no_predictor,
            abundance=abundance,
            taxometer=taxometer,
        )
        run(partial(run_reclustering, opt), general)
    elif args.subcommand == "avamb_ensemble":
        from .avamb_ensemble import run_ensemble_files
        from .pipeline import calc_tnf

        if not args.clusters:
            raise ValueError("avamb_ensemble requires --clusters")
        if (
            args.quality_report is None
            and args.markers is None
            and args.hmm_path is None
        ):
            raise ValueError(
                "avamb_ensemble requires a bin quality source: "
                "--quality_report, --markers, or --hmm_path"
            )
        general = _general_options_from_args(args)
        comp_options = _comp_options_from_args(args)

        from .utils import BinSplitter as _BinSplitter

        def _run_ensemble():
            composition = calc_tnf(
                comp_options, args.minlength, general.outdir,
                _BinSplitter.inert_splitter(),
            )
            identifiers = list(composition.metadata.identifiers)
            markers = None
            if args.quality_report is None:
                from .pipeline import MarkerOptions, load_markers

                markers = load_markers(
                    MarkerOptions(
                        markers_path=args.markers,
                        hmm_path=args.hmm_path,
                        fasta_path=comp_options.fasta,
                    ),
                    composition.metadata,
                    general.outdir,
                    general.nthreads,
                )
            nc_outdir = None
            fasta_out = None
            separator = None
            if args.write_bins:
                if comp_options.fasta is None:
                    raise ValueError(
                        "--write_bins requires the composition to be given "
                        "as --fasta"
                    )
                nc_outdir = general.outdir
                fasta_out = comp_options.fasta
                splitter = _BinSplitter(args.binsplit_separator)
                splitter.initialize(identifiers)
                separator = splitter.splitter
            run_ensemble_files(
                general.outdir.joinpath("ensemble_clusters.tsv"),
                args.clusters,
                args.quality_report,
                identifiers,
                composition.metadata.lengths,
                min_completeness=args.min_completeness,
                max_contamination=args.max_contamination,
                min_cov=args.min_cov,
                min_bin_size=args.min_bin_size,
                markers=markers,
                nc_outdir=nc_outdir,
                separator=separator,
                fasta_path=fasta_out,
                compress=args.compress_fasta_output,
            )

        run(_run_ensemble, general)
    else:
        parser.print_help()
        sys.exit(1)


if __name__ == "__main__":
    main()
