// wav.scp -> per-utterance speaker embeddings + RTF log.
//
// Behavioral contract (reference: runtime/onnxruntime/bin/
// extract_speaker_embedding.cpp:79-125): read a wav.scp, per utterance decode
// + fbank (native) + model forward, write one embedding text file per
// utterance, report total wall-clock vs audio duration (real-time factor).
//
// Two engines:
//   bridge (default) — XLA via the embedded-CPython bridge (model_spec is
//     a registry id or experiment dir);
//   aot — standalone PJRT C API execution of an exported StableHLO module
//     (model_spec is the cli/export_speaker_embedding.py --aot_dir output;
//     no Python involved — the reference's ONNX-Runtime-only binary
//     equivalent, reference: bin/extract_speaker_embedding.cpp:79).
//
// Usage: extract_speaker_embedding <wav.scp> <out_dir> <model_spec>
//        [--engine bridge|aot] [--plugin /path/libpjrt.so]
//        [--local_model_dir DIR] [--repo_root DIR]

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>

#include "s3d/chunk_plan.h"
#include "s3d/embedder.h"
#include "s3d/fbank.h"
#include "s3d/pjrt_engine.h"
#include "s3d/wav.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <wav.scp> <out_dir> <model_spec> "
                 "[--engine bridge|aot] [--plugin SO] "
                 "[--local_model_dir DIR] [--repo_root DIR]\n",
                 argv[0]);
    return 1;
  }
  std::string local_model_dir = "pretrained";
  std::string repo_root = ".";
  std::string engine = "bridge";
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  if (const char* env = std::getenv("SPEAKER3D_PJRT_PLUGIN")) plugin = env;
  for (int i = 4; i + 1 < argc; ++i) {
    if (std::strcmp(argv[i], "--local_model_dir") == 0)
      local_model_dir = argv[i + 1];
    if (std::strcmp(argv[i], "--repo_root") == 0) repo_root = argv[i + 1];
    if (std::strcmp(argv[i], "--engine") == 0) engine = argv[i + 1];
    if (std::strcmp(argv[i], "--plugin") == 0) plugin = argv[i + 1];
  }

  s3d::FbankOptions opts;
  opts.mean_norm = true;
  s3d::FbankComputer fbank(opts);
  std::unique_ptr<s3d::PjrtEngine> aot;
  std::unique_ptr<s3d::Embedder> bridge;
  if (engine == "aot") {
    aot.reset(new s3d::PjrtEngine(plugin, argv[3]));
  } else {
    bridge.reset(new s3d::Embedder(argv[3], local_model_dir, repo_root));
  }
  auto embed = [&](const std::vector<std::vector<float>>& feats) {
    return aot ? aot->Embed(feats) : bridge->Embed(feats);
  };

  std::ifstream scp(argv[1]);
  if (!scp) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }

  double total_audio_s = 0.0;
  int count = 0;
  const auto t0 = std::chrono::steady_clock::now();

  std::string line;
  while (std::getline(scp, line)) {
    std::istringstream ss(line);
    std::string utt, path;
    if (!(ss >> utt >> path)) continue;
    const s3d::WavData wav = s3d::ReadWav(path);
    total_audio_s += static_cast<double>(wav.samples.size()) / wav.sample_rate;
    std::vector<float> emb;
    if (aot && !aot->bucket_samples().empty()) {
      // variable-length serving: 10 s chunks / 90 s cap / circle-pad each
      // chunk to the smallest duration bucket / mean over chunk embeddings
      // (infer_sv_batch semantics; buckets from aot.json)
      const auto plan = s3d::PlanChunks(
          static_cast<int64_t>(wav.samples.size()), aot->bucket_samples(),
          aot->max_samples() > 0 ? aot->max_samples()
                                 : static_cast<int64_t>(90) * 16000);
      if (plan.empty()) continue;
      for (const auto& c : plan) {
        const auto piece = s3d::CirclePad(wav.samples.data() + c.start,
                                          c.length, c.padded);
        const auto e = embed(fbank.Compute(piece));
        if (emb.empty()) emb.assign(e.size(), 0.0f);
        for (size_t i = 0; i < e.size(); ++i) emb[i] += e[i];
      }
      for (auto& v : emb) v /= static_cast<float>(plan.size());
    } else {
      emb = embed(fbank.Compute(wav.samples));
    }

    const std::string out_path = std::string(argv[2]) + "/" + utt + ".emb";
    std::FILE* f = std::fopen(out_path.c_str(), "w");
    if (!f) {
      std::perror("fopen");
      return 1;
    }
    for (size_t i = 0; i < emb.size(); ++i)
      std::fprintf(f, "%s%.6f", i ? " " : "", emb[i]);
    std::fprintf(f, "\n");
    std::fclose(f);
    ++count;
  }

  const double elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  std::fprintf(stderr,
               "processed %d utts, %.2f s audio in %.2f s wall "
               "(RTF %.4f, %.1fx realtime)\n",
               count, total_audio_s, elapsed, elapsed / total_audio_s,
               total_audio_s / elapsed);
  return 0;
}
