#!/usr/bin/env bash
# Mixed adult/kid fine-tune + similarity analysis (reference:
# egs/mix_adult_kid/sv-eres2netv2/): warm-start ERes2NetV2 from a base
# experiment, fine-tune on the mixed-corpus CSV, then audit speaker/utt
# cosine similarities across the adult and kid subsets.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd)
if [ -n "${PALLAS_AXON_POOL_IPS:-}" ]; then
  # tunneled-TPU harness: PYTHONPATH breaks axon PJRT plugin registration
  # (see CLAUDE.md); import speaker3d_tpu via a cwd symlink instead (the
  # reference uses the same speakerlab symlink convention in its recipes)
  [ -e speaker3d_tpu ] || ln -s "$REPO_ROOT/speaker3d_tpu" speaker3d_tpu
else
  export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
fi
stage=${STAGE:-1}; stop_stage=${STOP_STAGE:-4}
data_csv=${DATA_CSV:-data/train_mix.csv}      # ID,wav,spk over both corpora
base_exp=${BASE_EXP:-exp/eres2netv2_base}     # pretrained base experiment
# the fork's production diarization embedder is w24s4ep4; point CONFIG at
# configs/eres2netv2_w24s4ep4.yaml to fine-tune it (measured training
# settings inside; default stays the 17.8M flagship)
config=${CONFIG:-$REPO_ROOT/configs/eres2netv2.yaml}
exp_dir=exp/eres2netv2_mix
if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  python -m speaker3d_tpu.cli.train --config "$config" \
    --data="$data_csv" --exp_dir=$exp_dir --init_exp_dir="$base_exp" \
    --num_epoch=10 --max_lr=0.0001 --min_lr=0.00001
fi
if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  python -m speaker3d_tpu.cli.extract --exp_dir $exp_dir \
    --data data/eval_wav.scp --out_dir $exp_dir/embeddings --mode exact
fi
if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  # speaker-level cross-corpus similarity report (dataset_map: spk -> adult|kid)
  python -m speaker3d_tpu.cli.analyze_similarity --emb $exp_dir/embeddings \
    --out_dir $exp_dir/similarity --utt2spk data/utt2spk \
    --dataset_map data/spk2dataset --level speaker --min_similarity 0.5
fi
if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  # utterance-level deep dive on the most confusable pairs
  python -m speaker3d_tpu.cli.analyze_similarity --emb $exp_dir/embeddings \
    --out_dir $exp_dir/similarity_utt --utt2spk data/utt2spk \
    --level utt --min_similarity 0.7 --max_results 1000
fi
