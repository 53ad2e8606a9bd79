#!/bin/bash
# Phase-2 accuracy queue: remaining non-attributed families, Pubmed,
# table_2 GNN baselines, Pubmed+GAE init, ScaLed AUC rows.
set -u
cd /root/repo
export STALE_SECS=3000
scripts/run_baseline_queue.sh \
  "nonattr_3=Router_PoS,Router_PoS_Plus,Router_SoP,PB_PoS,PB_PoS_Plus,PB_SoP,Ecoli_PoS,Ecoli_PoS_Plus,Ecoli_SoP" \
  "pubmed=Pubmed_PoS,Pubmed_PoS_Plus,Pubmed_SoP"
CONFIG=configs/paper/table_2.json scripts/run_baseline_queue.sh \
  "table2=USAir_SEAL,Celegans_SEAL,Power_SEAL,USAir_GCN_DE,Celegans_GCN_DE,Power_GCN_DE"
CONFIG=configs/baseline_extra.json scripts/run_baseline_queue.sh \
  "pubmed_gae=Pubmed_PoS_GAE"
CONFIG=configs/paper/scaled.json scripts/run_baseline_queue.sh \
  "scaled=Cora_PoS_ScaLed,Cora_PoS_Plus_ScaLed,CiteSeer_PoS_ScaLed,CiteSeer_PoS_Plus_ScaLed"
