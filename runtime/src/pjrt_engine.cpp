// PJRT C API execution engine (see include/s3d/pjrt_engine.h).
//
// The PJRT C API is a stable C ABI (struct_size-versioned); the header is
// vendored at include/pjrt/pjrt_c_api.h (Apache-2.0, from the public XLA
// repository). Plugin-specific client create options are passed through
// from the environment:
//   SPEAKER3D_PJRT_OPTIONS  "k=v,k=v" string/int named values (e.g. the
//                           axon TPU plugin wants topology=v5e:1x1x1,
//                           session_id=..., rank=4294967295)
// Values that parse as integers are sent as kInt64, others as kString.

#include "s3d/pjrt_engine.h"

#include <dlfcn.h>

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>

#include "pjrt/pjrt_c_api.h"

namespace s3d {
namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// Minimal hand-encoded xla.CompileOptionsProto: one ExecutableBuildOptions
// submessage (field 3) with device_ordinal=-1 (field 1), num_replicas=1
// (field 4), num_partitions=1 (field 5). Field numbers pinned against the
// shipped compile_options.pb.h.
std::string DefaultCompileOptionsProto() {
  std::string build;
  // device_ordinal = -1: tag (1<<3|0)=0x08, then 10-byte varint of
  // 0xFFFFFFFFFFFFFFFF
  build.push_back(0x08);
  for (int i = 0; i < 9; ++i) build.push_back(static_cast<char>(0xFF));
  build.push_back(0x01);
  build.push_back(0x20);  // num_replicas = 1: tag (4<<3|0)
  build.push_back(0x01);
  build.push_back(0x28);  // num_partitions = 1: tag (5<<3|0)
  build.push_back(0x01);
  std::string out;
  out.push_back(0x1A);  // executable_build_options: tag (3<<3|2)
  out.push_back(static_cast<char>(build.size()));
  out += build;
  return out;
}

// Tiny JSON value grabber for the flat aot.json meta ("key": value).
std::string JsonValue(const std::string& js, const std::string& key) {
  auto pos = js.find("\"" + key + "\"");
  if (pos == std::string::npos) return "";
  pos = js.find(':', pos);
  if (pos == std::string::npos) return "";
  ++pos;
  while (pos < js.size() && (js[pos] == ' ' || js[pos] == '"')) ++pos;
  size_t end = pos;
  while (end < js.size() && js[end] != ',' && js[end] != '}' &&
         js[end] != '"' && js[end] != '\n')
    ++end;
  return js.substr(pos, end - pos);
}

}  // namespace

struct PjrtEngine::Impl {
  void* dl = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  // (compiled frame count, executable), ascending by frames; single-shape
  // artifacts have exactly one entry
  std::vector<std::pair<int, PJRT_LoadedExecutable*>> execs;
  int emb_dim = 0;

  void Check(PJRT_Error* err, const char* what) {
    if (err == nullptr) return;
    std::string msg = what;
    PJRT_Error_Message_Args m;
    std::memset(&m, 0, sizeof(m));
    m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    m.error = err;
    api->PJRT_Error_Message(&m);
    msg += ": ";
    msg.append(m.message, m.message_size);
    PJRT_Error_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    api->PJRT_Error_Destroy(&d);
    throw std::runtime_error(msg);
  }

  void Await(PJRT_Event* event, const char* what) {
    PJRT_Event_Await_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    a.event = event;
    PJRT_Error* err = api->PJRT_Event_Await(&a);
    PJRT_Event_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    d.event = event;
    api->PJRT_Event_Destroy(&d);
    Check(err, what);
  }
};

PjrtEngine::PjrtEngine(const std::string& plugin_so,
                       const std::string& model_dir)
    : impl_(new Impl) {
  impl_->dl = dlopen(plugin_so.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!impl_->dl)
    throw std::runtime_error(std::string("dlopen failed: ") + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetApiFn>(dlsym(impl_->dl, "GetPjrtApi"));
  if (!get_api) throw std::runtime_error("GetPjrtApi not found in plugin");
  impl_->api = get_api();
  const PJRT_Api* api = impl_->api;
  if (!api) throw std::runtime_error("GetPjrtApi returned null");
  const bool debug = std::getenv("SPEAKER3D_PJRT_DEBUG") != nullptr;
  if (debug)
    std::fprintf(stderr,
                 "[pjrt_engine] api struct_size=%zu version=%d.%d\n",
                 api->struct_size, api->pjrt_api_version.major_version,
                 api->pjrt_api_version.minor_version);
  if (!api->PJRT_Plugin_Initialize || !api->PJRT_Client_Create ||
      !api->PJRT_Client_Compile || !api->PJRT_Client_BufferFromHostBuffer ||
      !api->PJRT_LoadedExecutable_Execute || !api->PJRT_Buffer_ToHostBuffer)
    throw std::runtime_error(
        "plugin PJRT_Api is missing required entry points "
        "(version mismatch with the vendored pjrt_c_api.h?)");

  {
    PJRT_Plugin_Initialize_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    if (debug) std::fprintf(stderr, "[pjrt_engine] Plugin_Initialize\n");
    impl_->Check(api->PJRT_Plugin_Initialize(&a), "PJRT_Plugin_Initialize");
  }

  // client create options from env (plugin-specific)
  std::vector<PJRT_NamedValue> options;
  std::vector<std::string> storage;  // keep name/value strings alive
  storage.reserve(64);  // NamedValues hold c_str() pointers: no realloc
  const char* opt_env = std::getenv("SPEAKER3D_PJRT_OPTIONS");
  if (opt_env && *opt_env) {
    std::stringstream ss(opt_env);
    std::string kv;
    while (std::getline(ss, kv, ',')) {
      auto eq = kv.find('=');
      if (eq == std::string::npos) continue;
      storage.push_back(kv.substr(0, eq));
      const std::string& name = storage.back();
      storage.push_back(kv.substr(eq + 1));
      const std::string& val = storage.back();
      PJRT_NamedValue nv;
      std::memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = name.c_str();
      nv.name_size = name.size();
      char* endp = nullptr;
      long long iv = std::strtoll(val.c_str(), &endp, 10);
      if (endp && *endp == '\0' && !val.empty()) {
        nv.type = PJRT_NamedValue_kInt64;
        nv.int64_value = iv;
        nv.value_size = 1;
      } else {
        nv.type = PJRT_NamedValue_kString;
        nv.string_value = val.c_str();
        nv.value_size = val.size();
      }
      options.push_back(nv);
    }
  }

  {
    PJRT_Client_Create_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    a.create_options = options.empty() ? nullptr : options.data();
    a.num_options = options.size();
    if (debug)
      std::fprintf(stderr, "[pjrt_engine] Client_Create (%zu options)\n",
                   options.size());
    impl_->Check(api->PJRT_Client_Create(&a), "PJRT_Client_Create");
    impl_->client = a.client;
    if (debug) std::fprintf(stderr, "[pjrt_engine] client ok\n");
  }
  {
    PJRT_Client_AddressableDevices_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    a.client = impl_->client;
    impl_->Check(api->PJRT_Client_AddressableDevices(&a),
                 "PJRT_Client_AddressableDevices");
    if (a.num_addressable_devices == 0)
      throw std::runtime_error("no addressable PJRT devices");
    impl_->device = a.addressable_devices[0];
  }

  // model meta + StableHLO module(s)
  const std::string meta = ReadFile(model_dir + "/aot.json");

  // variable-length serving buckets (cli/export_speaker_embedding.py
  // --aot_buckets): "buckets": [{"seconds":..,"samples":N,"frames":F},..].
  // Top-level scalar keys ("frames", "feat_dim", ...) are parsed from a
  // copy with the buckets array blanked out: per-bucket objects repeat the
  // same key names and JsonValue matches the FIRST occurrence, so parsing
  // the raw string would return buckets[0].frames instead of the top-level
  // legacy value (ADVICE r3).
  std::string meta_toplevel = meta;
  std::vector<int> bucket_frames;
  {
    auto bpos = meta.find("\"buckets\"");
    if (bpos != std::string::npos) {
      auto open = meta.find('[', bpos);
      auto close = meta.find(']', bpos);
      if (open != std::string::npos && close != std::string::npos) {
        std::string arr = meta.substr(open, close - open);
        for (size_t p = arr.find("\"samples\""); p != std::string::npos;
             p = arr.find("\"samples\"", p + 1)) {
          bucket_samples_.push_back(
              std::stoll(JsonValue(arr.substr(p), "samples")));
          bucket_frames.push_back(
              std::stoi(JsonValue(arr.substr(p), "frames")));
        }
        meta_toplevel.replace(open, close - open + 1,
                              std::string(close - open + 1, ' '));
      }
      const std::string ms = JsonValue(meta, "max_seconds");
      const std::string sr = JsonValue(meta, "sample_rate");
      if (!ms.empty() && !sr.empty())
        max_samples_ = static_cast<int64_t>(std::stod(ms) * std::stod(sr));
    }
  }
  frames_ = std::stoi(JsonValue(meta_toplevel, "frames"));
  feat_dim_ = std::stoi(JsonValue(meta_toplevel, "feat_dim"));
  impl_->emb_dim = std::stoi(JsonValue(meta_toplevel, "embedding_dim"));

  auto compile = [&](std::string code) -> PJRT_LoadedExecutable* {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = code.data();
    program.code_size = code.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    const std::string copts = DefaultCompileOptionsProto();
    PJRT_Client_Compile_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    a.client = impl_->client;
    a.program = &program;
    a.compile_options = copts.data();
    a.compile_options_size = copts.size();
    if (std::getenv("SPEAKER3D_PJRT_DEBUG"))
      std::fprintf(stderr, "[pjrt_engine] Client_Compile (%zu bytes)\n",
                   code.size());
    impl_->Check(api->PJRT_Client_Compile(&a), "PJRT_Client_Compile");
    return a.executable;
  };
  auto compile_stem = [&](const std::string& stem) {
    try {
      return compile(ReadFile(model_dir + "/" + stem + ".mlir.bc"));
    } catch (const std::exception& e) {
      // portable bytecode rejected by this plugin -> textual StableHLO
      std::fprintf(stderr, "[pjrt_engine] bytecode compile failed (%s); "
                   "retrying textual %s.mlir\n", e.what(), stem.c_str());
      return compile(ReadFile(model_dir + "/" + stem + ".mlir"));
    }
  };
  auto timed = [&](int f, const std::string& stem) {
    const auto t0 = std::chrono::steady_clock::now();
    impl_->execs.emplace_back(f, compile_stem(stem));
    const double s = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::fprintf(stderr, "[pjrt_engine] %s (%d frames) compiled in %.1f s\n",
                 stem.c_str(), f, s);
  };
  if (bucket_frames.empty()) {
    timed(frames_, "model");
  } else {
    for (int f : bucket_frames)
      timed(f, "model_f" + std::to_string(f));
  }
}

PjrtEngine::~PjrtEngine() {
  const PJRT_Api* api = impl_->api;
  if (api) {
    for (auto& fe : impl_->execs) {
      if (!fe.second) continue;
      PJRT_LoadedExecutable_Destroy_Args a;
      std::memset(&a, 0, sizeof(a));
      a.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
      a.executable = fe.second;
      api->PJRT_LoadedExecutable_Destroy(&a);
    }
    if (impl_->client) {
      PJRT_Client_Destroy_Args a;
      std::memset(&a, 0, sizeof(a));
      a.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
      a.client = impl_->client;
      api->PJRT_Client_Destroy(&a);
    }
  }
  if (impl_->dl) dlclose(impl_->dl);
  delete impl_;
}

std::vector<float> PjrtEngine::Embed(
    const std::vector<std::vector<float>>& feats) {
  const PJRT_Api* api = impl_->api;
  // bucket select: smallest compiled frame count that holds the input
  // (the CLI's circle-padded chunks match a bucket exactly); fall back to
  // the largest (trim) when none fits
  int frames = impl_->execs.back().first;
  PJRT_LoadedExecutable* exec = impl_->execs.back().second;
  for (const auto& fe : impl_->execs) {
    if (fe.first >= static_cast<int>(feats.size())) {
      frames = fe.first;
      exec = fe.second;
      break;
    }
  }
  // pad (repeat last frame) / trim to the compiled frame count
  std::vector<float> host(static_cast<size_t>(frames) * feat_dim_, 0.0f);
  for (int t = 0; t < frames; ++t) {
    const size_t src = t < static_cast<int>(feats.size())
                           ? t
                           : (feats.empty() ? 0 : feats.size() - 1);
    if (feats.empty()) break;
    std::memcpy(&host[static_cast<size_t>(t) * feat_dim_], feats[src].data(),
                sizeof(float) * feat_dim_);
  }

  const int64_t dims[3] = {1, frames, feat_dim_};
  PJRT_Buffer* in_buf = nullptr;
  {
    PJRT_Client_BufferFromHostBuffer_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    a.client = impl_->client;
    a.data = host.data();
    a.type = PJRT_Buffer_Type_F32;
    a.dims = dims;
    a.num_dims = 3;
    a.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    a.device = impl_->device;
    impl_->Check(api->PJRT_Client_BufferFromHostBuffer(&a),
                 "PJRT_Client_BufferFromHostBuffer");
    impl_->Await(a.done_with_host_buffer, "host buffer transfer");
    in_buf = a.buffer;
  }

  PJRT_Buffer* output = nullptr;
  {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_Buffer* args_for_device[1] = {in_buf};
    PJRT_Buffer* const* arg_lists[1] = {args_for_device};
    PJRT_Buffer* outs_for_device[1] = {nullptr};
    PJRT_Buffer** out_lists[1] = {outs_for_device};
    PJRT_Event* done[1] = {nullptr};

    PJRT_LoadedExecutable_Execute_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    a.executable = exec;
    a.options = &opts;
    a.argument_lists = arg_lists;
    a.num_devices = 1;
    a.num_args = 1;
    a.output_lists = out_lists;
    a.device_complete_events = done;
    impl_->Check(api->PJRT_LoadedExecutable_Execute(&a),
                 "PJRT_LoadedExecutable_Execute");
    impl_->Await(done[0], "execute");
    output = outs_for_device[0];
  }

  std::vector<float> emb(impl_->emb_dim, 0.0f);
  {
    PJRT_Buffer_ToHostBuffer_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    a.src = output;
    a.dst = emb.data();
    a.dst_size = emb.size() * sizeof(float);
    impl_->Check(api->PJRT_Buffer_ToHostBuffer(&a),
                 "PJRT_Buffer_ToHostBuffer");
    impl_->Await(a.event, "to host");
  }

  for (PJRT_Buffer* b : {in_buf, output}) {
    PJRT_Buffer_Destroy_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    a.buffer = b;
    api->PJRT_Buffer_Destroy(&a);
  }
  return emb;
}

}  // namespace s3d
