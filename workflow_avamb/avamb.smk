# Avamb ensemble workflow for vamb_tpu.
#
# Role parity: /root/reference/workflow_avamb/avamb.snake.conda.smk (742
# lines, 18 rules). This workflow is deliberately much smaller because the
# reference's decision stages (CheckM2 score dictionaries, z/y manual
# dereplication, contig "ripping", NC-bin aggregation — its rules
# create_cluster_scores_bin_path_dictionaries, run_drep_manual_vamb_z_y,
# create_ripped_bins_avamb, nc_clusters_and_bins_from_mdrep_clusters_avamb,
# update_cs_d_avamb and aggregate_nc_bins_avamb, backed by ~1.7 kLoC of
# helper scripts) are implemented natively in `vamb_tpu.avamb_ensemble`
# and run as ONE rule here. Only the external-tool stages remain rules:
# concatenate, minimap2 index/map, samtools sort, binning, and (optionally)
# CheckM2 — with a config switch to score bins natively from single-copy
# marker genes instead, which removes the CheckM2 dependency entirely.
#
# Usage:
#   snakemake -s workflow_avamb/avamb.smk --configfile workflow_avamb/config.json \
#       --cores 16 --use-conda   # conda only needed for minimap2/samtools/checkm2
#
# Inputs (see config.json):
#   contigs       text file, one per-sample assembly FASTA path per line
#   sample_data   TSV: sample_id <TAB> fw_reads.fq.gz <TAB> rv_reads.fq.gz

import os

SRC = os.path.normpath(os.path.join(workflow.basedir, "..", "src"))
OUTDIR = config.get("outdir", "avamb_outdir")
MIN_CONTIG_SIZE = int(config.get("min_contig_size", 2000))
MIN_BIN_SIZE = int(config.get("min_bin_size", 200_000))
MIN_IDENTITY = float(config.get("min_identity", 0.95))
INDEX_SIZE = config.get("index_size", "3G")
AVAMB_PARAMS = config.get("avamb_params", "-o C --seed 0")
MIN_COMP = float(config.get("min_comp", 0.9))
MAX_CONT = float(config.get("max_cont", 0.05))
# "checkm2" (external) or "native" (built-in single-copy marker scoring)
SCORING = config.get("scoring", "native")
HMM_PATH = config.get("hmm_path", "")  # required when SCORING == "native"
THREADS = int(config.get("threads", 16))

SAMPLES = []
SAMPLE_READS = {}
with open(config["sample_data"]) as f:
    for line in f:
        if line.strip():
            sample, fw, rv = line.strip().split("\t")
            SAMPLES.append(sample)
            SAMPLE_READS[sample] = (fw, rv)


rule all:
    input:
        os.path.join(OUTDIR, "Final_bins", "quality_report.tsv"),


rule cat_contigs:
    input:
        config["contigs"],
    output:
        os.path.join(OUTDIR, "contigs.flt.fna.gz"),
    threads: 1
    shell:
        "python {SRC}/concatenate.py {output} $(cat {input}) -m {MIN_CONTIG_SIZE}"


rule minimap_index:
    input:
        os.path.join(OUTDIR, "contigs.flt.fna.gz"),
    output:
        os.path.join(OUTDIR, "contigs.flt.mmi"),
    threads: 1
    shell:
        "minimap2 -I {INDEX_SIZE} -d {output} {input}"


rule minimap_map_sort:
    input:
        index=os.path.join(OUTDIR, "contigs.flt.mmi"),
    output:
        bam=os.path.join(OUTDIR, "mapped", "{sample}.sort.bam"),
    params:
        fw=lambda wc: SAMPLE_READS[wc.sample][0],
        rv=lambda wc: SAMPLE_READS[wc.sample][1],
    threads: THREADS
    shell:
        "minimap2 -t {threads} -ax sr {input.index} {params.fw} {params.rv}"
        " | samtools view -u -F 3584"
        " | samtools sort -@ {threads} -o {output.bam} -"


rule run_avamb:
    input:
        contigs=os.path.join(OUTDIR, "contigs.flt.fna.gz"),
        bams=expand(os.path.join(OUTDIR, "mapped", "{sample}.sort.bam"), sample=SAMPLES),
    output:
        z=os.path.join(OUTDIR, "avamb", "aae_z_clusters_unsplit.tsv"),
        y=os.path.join(OUTDIR, "avamb", "aae_y_clusters_unsplit.tsv"),
    threads: THREADS
    shell:
        "rm -rf {OUTDIR}/avamb && "
        "python -m vamb_tpu bin avamb --outdir {OUTDIR}/avamb"
        " --fasta {input.contigs} --bamdir {OUTDIR}/mapped"
        " -m {MIN_CONTIG_SIZE} -z {MIN_IDENTITY} {AVAMB_PARAMS}"


# ---- bin scoring: external CheckM2, or the built-in marker backend -------

rule write_ensemble_bins:
    # Per-bin FASTAs for CheckM2 (only needed on the checkm2 path).
    input:
        contigs=os.path.join(OUTDIR, "contigs.flt.fna.gz"),
        clusters=os.path.join(OUTDIR, "avamb", "aae_{space}_clusters_unsplit.tsv"),
    output:
        directory(os.path.join(OUTDIR, "bins_{space}")),
    threads: 1
    shell:
        "python {SRC}/create_fasta.py {input.contigs} {input.clusters}"
        " {MIN_BIN_SIZE} {output}"


rule checkm2:
    input:
        os.path.join(OUTDIR, "bins_{space}"),
    output:
        os.path.join(OUTDIR, "checkm2_{space}", "quality_report.tsv"),
    threads: THREADS
    shell:
        "checkm2 predict --input {input} --output-directory {OUTDIR}/checkm2_{wildcards.space}"
        " --threads {threads} --extension .fna --force"


rule merge_checkm2:
    input:
        z=os.path.join(OUTDIR, "checkm2_z", "quality_report.tsv"),
        y=os.path.join(OUTDIR, "checkm2_y", "quality_report.tsv"),
    output:
        os.path.join(OUTDIR, "checkm2_all.tsv"),
    threads: 1
    shell:
        "(cat {input.z}; tail -n +2 {input.y}) > {output}"


# ---- ensemble decision + final outputs (native, one rule) ----------------

def _scoring_inputs(wildcards):
    inputs = {
        "contigs": os.path.join(OUTDIR, "contigs.flt.fna.gz"),
        "z": os.path.join(OUTDIR, "avamb", "aae_z_clusters_unsplit.tsv"),
        "y": os.path.join(OUTDIR, "avamb", "aae_y_clusters_unsplit.tsv"),
    }
    if SCORING == "checkm2":
        inputs["quality"] = os.path.join(OUTDIR, "checkm2_all.tsv")
    return inputs


rule avamb_ensemble:
    # Dereplication across z/y ensembles, contig-overlap ripping, NC-bin
    # FASTA output and final quality report — the reference workflow's
    # entire second half, natively.
    input:
        unpack(_scoring_inputs),
    output:
        os.path.join(OUTDIR, "Final_bins", "quality_report.tsv"),
    params:
        quality=(
            "--quality_report " + os.path.join(OUTDIR, "checkm2_all.tsv")
            if SCORING == "checkm2"
            else "--hmm_path " + HMM_PATH
        ),
    threads: THREADS
    shell:
        "rm -rf {OUTDIR}/Final_bins && "
        "python -m vamb_tpu avamb_ensemble --outdir {OUTDIR}/Final_bins"
        " --fasta {input.contigs} --clusters {input.z} {input.y}"
        " {params.quality} --min_completeness {MIN_COMP} --max_contamination {MAX_CONT}"
        " --min_bin_size {MIN_BIN_SIZE} --write_bins"
