// Standalone speaker-embedding execution through the PJRT C API — no
// embedded CPython. Loads a PJRT plugin shared object (GetPjrtApi), creates
// a client, compiles the exported StableHLO module once, and executes
// [1, frames, feat_dim] f32 -> [1, emb_dim] f32 per utterance.
//
// Reference analogue: the ONNX Runtime session in
// runtime/onnxruntime/model/speaker_embedding_model.cpp:25-69 — a native
// serving path that needs only the accelerator runtime library, not a
// Python interpreter. Here the runtime library is a PJRT plugin (e.g. the
// TPU plugin); the model artifact is the raw StableHLO bytecode written by
// cli/export_speaker_embedding.py --aot_dir.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace s3d {

class PjrtEngine {
 public:
  // plugin_so: path to a PJRT plugin (e.g. /opt/axon/libaxon_pjrt.so).
  // model_dir: directory with model.mlir.bc + aot.json (input shape meta).
  // Throws std::runtime_error on any PJRT failure.
  PjrtEngine(const std::string& plugin_so, const std::string& model_dir);
  ~PjrtEngine();

  // feats [num_frames][feat_dim]: executed on the bucket executable with
  // the smallest compiled frame count >= num_frames (padded by repeating
  // the last frame / trimmed when no bucket fits), returns the embedding.
  std::vector<float> Embed(const std::vector<std::vector<float>>& feats);

  int frames() const { return frames_; }
  int feat_dim() const { return feat_dim_; }
  // variable-length serving meta (empty when the artifact is single-shape)
  const std::vector<int64_t>& bucket_samples() const {
    return bucket_samples_;
  }
  int64_t max_samples() const { return max_samples_; }

 private:
  struct Impl;
  Impl* impl_;
  int frames_ = 0;
  int feat_dim_ = 0;
  std::vector<int64_t> bucket_samples_;
  int64_t max_samples_ = 0;
};

}  // namespace s3d
