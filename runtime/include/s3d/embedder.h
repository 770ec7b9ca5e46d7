// Speaker-embedding model execution via an embedded CPython/XLA bridge.
//
// The native layer owns IO/feature/batching (this library); the model itself
// is a jit-compiled XLA executable reached through the embedded interpreter
// (speaker3d_tpu/runtime_bridge.py). This mirrors the reference's split
// between its C++ frontend and the ONNX Runtime session
// (reference: runtime/onnxruntime/model/speaker_embedding_model.h:27).
#pragma once

#include <string>
#include <vector>

namespace s3d {

class Embedder {
 public:
  // model_spec: registry model id or experiment dir.
  Embedder(const std::string& model_spec, const std::string& local_model_dir,
           const std::string& repo_root);
  ~Embedder();

  // feats: [num_frames][feat_dim] -> embedding vector.
  std::vector<float> Embed(const std::vector<std::vector<float>>& feats);

 private:
  void* embed_fn_ = nullptr;  // PyObject*
};

}  // namespace s3d
