#include "s3d/embedder.h"

#include <Python.h>

#include <cstring>
#include <stdexcept>
#include <string>

namespace s3d {
namespace {

void ThrowPyError(const std::string& where) {
  PyErr_Print();
  throw std::runtime_error("python error in " + where);
}

}  // namespace

Embedder::Embedder(const std::string& model_spec,
                   const std::string& local_model_dir,
                   const std::string& repo_root) {
  if (!Py_IsInitialized()) Py_Initialize();

  // Make the repo importable inside the embedded interpreter.
  PyObject* sys_path = PySys_GetObject("path");  // borrowed
  PyObject* root = PyUnicode_FromString(repo_root.c_str());
  PyList_Insert(sys_path, 0, root);
  Py_DECREF(root);

  PyObject* mod = PyImport_ImportModule("speaker3d_tpu.runtime_bridge");
  if (!mod) ThrowPyError("import runtime_bridge");
  PyObject* ret = PyObject_CallMethod(mod, "init", "ss", model_spec.c_str(),
                                      local_model_dir.c_str());
  if (!ret) ThrowPyError("runtime_bridge.init");
  Py_DECREF(ret);
  embed_fn_ = PyObject_GetAttrString(mod, "embed");
  Py_DECREF(mod);
  if (!embed_fn_) ThrowPyError("runtime_bridge.embed lookup");
}

Embedder::~Embedder() {
  Py_XDECREF(reinterpret_cast<PyObject*>(embed_fn_));
}

std::vector<float> Embedder::Embed(
    const std::vector<std::vector<float>>& feats) {
  const Py_ssize_t num_frames = static_cast<Py_ssize_t>(feats.size());
  const Py_ssize_t feat_dim =
      num_frames > 0 ? static_cast<Py_ssize_t>(feats[0].size()) : 0;
  std::vector<float> flat;
  flat.reserve(num_frames * feat_dim);
  for (const auto& row : feats) flat.insert(flat.end(), row.begin(), row.end());

  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(flat.data()),
      static_cast<Py_ssize_t>(flat.size() * sizeof(float)));
  PyObject* out = PyObject_CallFunction(
      reinterpret_cast<PyObject*>(embed_fn_), "Onn", bytes, num_frames,
      feat_dim);
  Py_DECREF(bytes);
  if (!out) ThrowPyError("runtime_bridge.embed");

  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(out, &buf, &len) != 0)
    ThrowPyError("embed result decode");
  std::vector<float> emb(len / sizeof(float));
  std::memcpy(emb.data(), buf, static_cast<size_t>(len));
  Py_DECREF(out);
  return emb;
}

}  // namespace s3d
