// rtpu_host — a Python-free C++ consumer of .rtpu artifacts.
//
// This is the framework's analog of the reference's C++ deployment hosts
// (nn~ for Max/PD and the RAVE VST consume the TorchScript artifact,
// reference scripts/export.py:586 + nn_tilde). It drives the AOT-lowered
// StableHLO streaming step functions (see rave_tpu/export/export.py,
// _aot_lower) through the PJRT C++ API with the XLA:CPU backend linked
// from libtensorflow_cc — no Python, no JAX runtime, only the artifact
// directory: manifest.json + <method>.mlir.
//
// Usage:
//   rtpu_host <model.rtpu> info
//   rtpu_host <model.rtpu> forward <in.wav> <out.wav> [seed_base]
//   rtpu_host <model.rtpu> encode  <in.wav> <latents.f32> [seed_base]
//   rtpu_host <model.rtpu> decode  <latents.f32> <out.wav> [seed_base]
//   rtpu_host <model.rtpu> prior   <n_frames> <latents.f32> [seed_base]
//
// Run on a TPU (or any PJRT plugin) instead of in-process XLA:CPU with
//   rtpu_host --plugin /path/to/pjrt_plugin.so [--opt key=value ...] ...
//
// Named attributes (the nn_tilde register_attribute analog — AdaIN style
// transfer on adain-equipped artifacts):
//   --attr learn_target=1   set an attribute before streaming (repeatable;
//                           bare `--attr reset_target` means value 1)
//   --save-state f / --load-state f   persist the streaming state across
//                           invocations, so learn-target / learn-source /
//                           transfer can run as separate processes.
//
// Compiled executables are cached in <model.rtpu>/.exe_cache keyed by
// (method bytecode, platform), so the second launch skips the StableHLO
// compile entirely — what an audio-plugin host wants at session open.
// --no-exe-cache disables both lookup and write.
//
// Latent files are raw little-endian float32, [n_frames, latent_size]
// row-major (the shape is printed and recoverable from the manifest).
// The per-block seed is seed_base + block_index; the Python test replays
// the same schedule through the same modules to verify equivalence.
//
// Streaming state stays resident on the PJRT device between blocks: the
// state outputs of call N are passed as the state inputs of call N+1
// without any host round trip (manifest aot.<method>.state_inputs /
// state_outputs give the flat indices; zeros initialize).

#include <dlfcn.h>
#include <sys/stat.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <random>
#include <string>
#include <vector>

#include "xla/hlo/builder/xla_computation.h"
#include "xla/pjrt/c/pjrt_c_api.h"
#include "xla/pjrt/pjrt_client.h"
#include "xla/pjrt/pjrt_executable.h"
#include "xla/pjrt/plugin/xla_cpu/xla_cpu_pjrt_client.h"

namespace xla {
// Declared in xla/pjrt/mlir_to_hlo.h and xla/pjrt/c_api_client/
// pjrt_c_api_client.h; re-declared here so we don't need the MLIR/LLVM
// header tree (the symbols are exported by libtensorflow_cc.so.2).
absl::Status ParseMlirModuleStringAndConvertToXlaComputation(
    absl::string_view mlir_module_str, XlaComputation& xla_computation,
    bool use_tuple_args, bool return_tuple);
class KeyValueStoreInterface;
absl::StatusOr<std::unique_ptr<PjRtClient>> WrapClientAroundCApi(
    const PJRT_Api* c_api,
    const absl::flat_hash_map<std::string, PjRtValueType>& create_options,
    std::shared_ptr<KeyValueStoreInterface> kv_store);
}  // namespace xla

namespace {

// ---------------------------------------------------------------------------
// Minimal JSON parser — enough for machine-generated manifest.json.
// ---------------------------------------------------------------------------
struct Json {
  enum Kind { kNull, kBool, kNum, kStr, kArr, kObj } kind = kNull;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<Json> arr;
  std::map<std::string, Json> obj;

  const Json& at(const std::string& k) const {
    static const Json null;
    auto it = obj.find(k);
    return it == obj.end() ? null : it->second;
  }
  bool has(const std::string& k) const { return obj.count(k) > 0; }
  int64_t i64() const { return static_cast<int64_t>(num); }
};

class JsonParser {
 public:
  explicit JsonParser(const std::string& s) : s_(s) {}
  Json Parse() {
    Json v = Value();
    Ws();
    if (p_ != s_.size()) Fail("trailing data");
    return v;
  }

 private:
  const std::string& s_;
  size_t p_ = 0;

  [[noreturn]] void Fail(const char* what) {
    fprintf(stderr, "manifest.json parse error at byte %zu: %s\n", p_, what);
    exit(1);
  }
  void Ws() {
    while (p_ < s_.size() && (s_[p_] == ' ' || s_[p_] == '\n' ||
                              s_[p_] == '\t' || s_[p_] == '\r'))
      p_++;
  }
  char Peek() {
    if (p_ >= s_.size()) Fail("eof");
    return s_[p_];
  }
  void Expect(char c) {
    if (Peek() != c) Fail("unexpected char");
    p_++;
  }
  Json Value() {
    Ws();
    char c = Peek();
    if (c == '{') return Obj();
    if (c == '[') return Arr();
    if (c == '"') {
      Json v;
      v.kind = Json::kStr;
      v.str = Str();
      return v;
    }
    if (c == 't' || c == 'f') {
      Json v;
      v.kind = Json::kBool;
      v.b = (c == 't');
      p_ += v.b ? 4 : 5;
      return v;
    }
    if (c == 'n') {
      p_ += 4;
      return Json();
    }
    return Num();
  }
  std::string Str() {
    Expect('"');
    std::string out;
    while (Peek() != '"') {
      char c = s_[p_++];
      if (c == '\\') {
        char e = s_[p_++];
        switch (e) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            // manifest strings are ASCII in practice; decode BMP as UTF-8
            unsigned code = 0;
            for (int i = 0; i < 4; i++) {
              char h = s_[p_++];
              code = code * 16 + (h <= '9' ? h - '0' : (h | 32) - 'a' + 10);
            }
            if (code < 0x80) {
              out += static_cast<char>(code);
            } else if (code < 0x800) {
              out += static_cast<char>(0xC0 | (code >> 6));
              out += static_cast<char>(0x80 | (code & 0x3F));
            } else {
              out += static_cast<char>(0xE0 | (code >> 12));
              out += static_cast<char>(0x80 | ((code >> 6) & 0x3F));
              out += static_cast<char>(0x80 | (code & 0x3F));
            }
            break;
          }
          default: out += e;
        }
      } else {
        out += c;
      }
    }
    p_++;
    return out;
  }
  Json Num() {
    size_t start = p_;
    while (p_ < s_.size() && (isdigit(s_[p_]) || s_[p_] == '-' ||
                              s_[p_] == '+' || s_[p_] == '.' ||
                              s_[p_] == 'e' || s_[p_] == 'E'))
      p_++;
    Json v;
    v.kind = Json::kNum;
    v.num = atof(s_.substr(start, p_ - start).c_str());
    return v;
  }
  Json Arr() {
    Expect('[');
    Json v;
    v.kind = Json::kArr;
    Ws();
    if (Peek() == ']') {
      p_++;
      return v;
    }
    while (true) {
      v.arr.push_back(Value());
      Ws();
      if (Peek() == ',') {
        p_++;
        continue;
      }
      Expect(']');
      return v;
    }
  }
  Json Obj() {
    Expect('{');
    Json v;
    v.kind = Json::kObj;
    Ws();
    if (Peek() == '}') {
      p_++;
      return v;
    }
    while (true) {
      Ws();
      std::string k = Str();
      Ws();
      Expect(':');
      v.obj[k] = Value();
      Ws();
      if (Peek() == ',') {
        p_++;
        continue;
      }
      Expect('}');
      return v;
    }
  }
};

// ---------------------------------------------------------------------------
// WAV I/O — PCM16 and IEEE float32, interleaved.
// ---------------------------------------------------------------------------
struct Wav {
  int sample_rate = 0;
  int channels = 0;
  std::vector<float> frames;  // interleaved [T, C]
  int64_t n_frames() const { return channels ? frames.size() / channels : 0; }
};

bool ReadWav(const std::string& path, Wav* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  f.read(riff, 4);
  f.read(reinterpret_cast<char*>(&riff_size), 4);
  f.read(wave, 4);
  if (memcmp(riff, "RIFF", 4) || memcmp(wave, "WAVE", 4)) return false;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  while (f) {
    char id[4];
    uint32_t size;
    f.read(id, 4);
    f.read(reinterpret_cast<char*>(&size), 4);
    if (!f) break;
    if (!memcmp(id, "fmt ", 4)) {
      std::vector<char> buf(size);
      f.read(buf.data(), size);
      fmt = *reinterpret_cast<uint16_t*>(&buf[0]);
      channels = *reinterpret_cast<uint16_t*>(&buf[2]);
      rate = *reinterpret_cast<uint32_t*>(&buf[4]);
      bits = *reinterpret_cast<uint16_t*>(&buf[14]);
      if (fmt == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        fmt = *reinterpret_cast<uint16_t*>(&buf[24]);
      }
    } else if (!memcmp(id, "data", 4)) {
      std::vector<char> buf(size);
      f.read(buf.data(), size);
      out->sample_rate = rate;
      out->channels = channels;
      if (fmt == 1 && bits == 16) {
        const int16_t* p = reinterpret_cast<const int16_t*>(buf.data());
        size_t n = size / 2;
        out->frames.resize(n);
        for (size_t i = 0; i < n; i++) out->frames[i] = p[i] / 32768.f;
      } else if (fmt == 3 && bits == 32) {
        const float* p = reinterpret_cast<const float*>(buf.data());
        out->frames.assign(p, p + size / 4);
      } else {
        fprintf(stderr, "unsupported wav: fmt=%d bits=%d\n", fmt, bits);
        return false;
      }
      return channels > 0;
    } else {
      f.seekg(size + (size & 1), std::ios::cur);
    }
  }
  return false;
}

bool WriteWav(const std::string& path, const Wav& w) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  uint32_t data_size = static_cast<uint32_t>(w.frames.size() * 2);
  uint32_t riff_size = 36 + data_size;
  uint16_t fmt = 1, bits = 16, ch = static_cast<uint16_t>(w.channels);
  uint32_t rate = w.sample_rate, byte_rate = rate * ch * 2;
  uint16_t block_align = ch * 2;
  uint32_t fmt_size = 16;
  f.write("RIFF", 4);
  f.write(reinterpret_cast<char*>(&riff_size), 4);
  f.write("WAVE", 4);
  f.write("fmt ", 4);
  f.write(reinterpret_cast<char*>(&fmt_size), 4);
  f.write(reinterpret_cast<char*>(&fmt), 2);
  f.write(reinterpret_cast<char*>(&ch), 2);
  f.write(reinterpret_cast<char*>(&rate), 4);
  f.write(reinterpret_cast<char*>(&byte_rate), 4);
  f.write(reinterpret_cast<char*>(&block_align), 2);
  f.write(reinterpret_cast<char*>(&bits), 2);
  f.write("data", 4);
  f.write(reinterpret_cast<char*>(&data_size), 4);
  for (float x : w.frames) {
    float c = x < -1.f ? -1.f : (x > 1.f ? 1.f : x);
    int16_t q = static_cast<int16_t>(c * 32767.f);
    f.write(reinterpret_cast<char*>(&q), 2);
  }
  return true;
}

// ---------------------------------------------------------------------------
// PJRT streaming runner
// ---------------------------------------------------------------------------
std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot read %s\n", path.c_str());
    exit(1);
  }
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

bool TryReadFile(const std::string& path, std::string* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  out->assign((std::istreambuf_iterator<char>(f)),
              std::istreambuf_iterator<char>());
  return true;
}

bool WriteFileAtomic(const std::string& path, const std::string& data) {
  std::string tmp = path + ".tmp";
  {
    std::ofstream f(tmp, std::ios::binary | std::ios::trunc);
    if (!f) return false;
    f.write(data.data(), static_cast<std::streamsize>(data.size()));
    if (!f) return false;
  }
  return rename(tmp.c_str(), path.c_str()) == 0;
}

uint64_t Fnv1a64(const std::string& s) {
  uint64_t h = 1469598103934665603ull;
  for (unsigned char c : s) {
    h ^= c;
    h *= 1099511628211ull;
  }
  return h;
}

xla::PrimitiveType DtypeToXla(const std::string& d) {
  if (d == "float32") return xla::F32;
  if (d == "uint32") return xla::U32;
  if (d == "int32") return xla::S32;
  if (d == "bfloat16") return xla::BF16;
  if (d == "float16") return xla::F16;
  if (d == "bool") return xla::PRED;
  if (d == "int64") return xla::S64;
  if (d == "uint64") return xla::U64;
  fprintf(stderr, "unsupported dtype %s\n", d.c_str());
  exit(1);
}

int64_t DtypeBytes(const std::string& d) {
  if (d == "bfloat16" || d == "float16") return 2;
  if (d == "bool") return 1;
  if (d == "int64" || d == "uint64") return 8;
  return 4;
}

struct TensorSpec {
  std::vector<int64_t> shape;
  std::string dtype;
  int64_t elems() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
  int64_t bytes() const { return elems() * DtypeBytes(dtype); }
};

std::vector<TensorSpec> ParseSpecs(const Json& list) {
  std::vector<TensorSpec> out;
  for (const auto& t : list.arr) {
    TensorSpec s;
    s.dtype = t.at("dtype").str;
    for (const auto& d : t.at("shape").arr) s.shape.push_back(d.i64());
    out.push_back(std::move(s));
  }
  return out;
}

#define CHECK_OK(expr)                                            \
  do {                                                            \
    auto _st = (expr);                                            \
    if (!_st.ok()) {                                              \
      fprintf(stderr, "%s\n", _st.ToString().c_str());            \
      exit(1);                                                    \
    }                                                             \
  } while (0)

template <typename T>
T ValueOrDie(absl::StatusOr<T> v, const char* what) {
  if (!v.ok()) {
    fprintf(stderr, "%s: %s\n", what, v.status().ToString().c_str());
    exit(1);
  }
  return std::move(v).value();
}

// A named attribute set on the command line: --attr name[=value].
struct AttrOp {
  std::string name;
  float value = 1.f;
};

// A loaded AOT method: compiled executable + flat I/O specs + state mapping.
struct Method {
  std::unique_ptr<xla::PjRtLoadedExecutable> exe;
  std::vector<TensorSpec> inputs, outputs;
  int64_t n_state = 0;
  // streaming state buffers, resident on device between calls
  std::vector<std::unique_ptr<xla::PjRtBuffer>> state;
};

class RtpuHost {
 public:
  // plugin_path empty -> in-process XLA:CPU. Otherwise dlopen a PJRT
  // C-API plugin (e.g. libtpu.so) and wrap it; plugin_opts are the
  // plugin's PJRT_Client_Create named options.
  RtpuHost(const std::string& artifact_dir, const std::string& plugin_path,
           const absl::flat_hash_map<std::string, xla::PjRtValueType>&
               plugin_opts)
      : dir_(artifact_dir) {
    manifest_ = JsonParser(ReadFile(dir_ + "/manifest.json")).Parse();
    if (plugin_path.empty()) {
      xla::CpuClientOptions opts;
      opts.cpu_device_count = 1;
      client_ =
          ValueOrDie(xla::GetXlaPjrtCpuClient(std::move(opts)), "client");
    } else {
      void* lib = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
      if (!lib) {
        fprintf(stderr, "dlopen %s: %s\n", plugin_path.c_str(), dlerror());
        exit(1);
      }
      auto get_api =
          reinterpret_cast<const PJRT_Api* (*)()>(dlsym(lib, "GetPjrtApi"));
      if (!get_api) {
        fprintf(stderr, "%s has no GetPjrtApi\n", plugin_path.c_str());
        exit(1);
      }
      client_ = ValueOrDie(
          xla::WrapClientAroundCApi(get_api(), plugin_opts, nullptr),
          "plugin client");
      fprintf(stderr, "pjrt plugin: platform=%s devices=%d\n",
              std::string(client_->platform_name()).c_str(),
              client_->device_count());
    }
    mem_ = ValueOrDie(client_->devices()[0]->default_memory_space(), "memory");
  }

  const Json& manifest() const { return manifest_; }

  Method& Load(const std::string& name) {
    auto it = methods_.find(name);
    if (it != methods_.end()) return it->second;
    const Json& aot = manifest_.at("aot").at(name);
    if (!aot.has("mlir_file")) {
      fprintf(stderr,
              "artifact has no AOT module for %s (re-export with a "
              "framework version that writes <method>.mlir)\n",
              name.c_str());
      exit(1);
    }
    if (aot.has("kept_inputs") &&
        aot.at("kept_inputs").arr.size() != aot.at("inputs").arr.size()) {
      fprintf(stderr,
              "%s: the lowered module dropped unused inputs "
              "(kept %zu of %zu) — positional marshaling unsupported\n",
              name.c_str(), aot.at("kept_inputs").arr.size(),
              aot.at("inputs").arr.size());
      exit(1);
    }
    std::string bytecode = ReadFile(dir_ + "/" + aot.at("mlir_file").str);
    Method m;
    // Executable cache: compiling the StableHLO dominates host startup
    // (seconds per method on XLA:CPU). Serialized executables are keyed by
    // (bytecode, platform); a compiler/machine mismatch just falls back to
    // a fresh compile and rewrites the entry.
    char cache_name[64];
    snprintf(cache_name, sizeof cache_name, "%016llx.pjrt",
             (unsigned long long)Fnv1a64(bytecode));
    std::string platform(client_->platform_name());
    std::string cache_dir = dir_ + "/.exe_cache";
    std::string cache_path =
        cache_dir + "/" + name + "." + platform + "." + cache_name;
    std::string serialized;
    if (!no_exe_cache_ && TryReadFile(cache_path, &serialized)) {
      auto loaded = client_->LoadSerializedExecutable(
          serialized, std::nullopt, xla::LoadOptions());
      if (loaded.ok()) {
        m.exe = std::move(loaded).value();
      } else {
        fprintf(stderr, "exe cache miss (%s): %s\n", name.c_str(),
                loaded.status().ToString().c_str());
      }
    }
    if (!m.exe) {
      xla::XlaComputation comp;
      CHECK_OK(xla::ParseMlirModuleStringAndConvertToXlaComputation(
          bytecode, comp, /*use_tuple_args=*/false, /*return_tuple=*/false));
      xla::CompileOptions copts;
      m.exe = ValueOrDie(client_->CompileAndLoad(comp, copts), "compile");
      if (!no_exe_cache_) {
        auto ser = m.exe->SerializeExecutable();
        if (ser.ok()) {
          mkdir(cache_dir.c_str(), 0755);
          if (!WriteFileAtomic(cache_path, *ser))
            fprintf(stderr, "exe cache write failed: %s\n",
                    cache_path.c_str());
        } else {
          fprintf(stderr, "exe serialize unsupported (%s): %s\n",
                  platform.c_str(), ser.status().ToString().c_str());
        }
      }
    }
    m.inputs = ParseSpecs(aot.at("inputs"));
    m.outputs = ParseSpecs(aot.at("outputs"));
    m.n_state = aot.at("n_state").i64();
    // zero-initialized streaming state
    for (int64_t i = 0; i < m.n_state; i++) {
      const TensorSpec& s = m.inputs[i];
      std::vector<char> zeros(s.bytes(), 0);
      m.state.push_back(Upload(zeros.data(), s));
    }
    ApplyStateInit(name, m, aot);
    return methods_.emplace(name, std::move(m)).first->second;
  }

  // --load-state then --attr fills, in that order (so an attribute can
  // override a loaded flag). Attribute semantics come from the manifest's
  // attribute_ops table: each op fills every state leaf whose pytree path
  // (aot.<method>.state_leaves) ends with op.leaf.
  void SetStateOptions(std::vector<AttrOp> attrs, std::string load_path,
                       std::string save_path) {
    attrs_ = std::move(attrs);
    load_state_ = std::move(load_path);
    save_state_ = std::move(save_path);
  }
  const std::string& save_state_path() const { return save_state_; }

  void ApplyStateInit(const std::string& name, Method& m, const Json& aot) {
    if (!load_state_.empty()) {
      std::string raw = ReadFile(load_state_);
      const char* p = raw.data();
      const char* end = raw.data() + raw.size();
      if (raw.size() < 16 || memcmp(p, "RTPUST01", 8) != 0) {
        fprintf(stderr, "%s: not an rtpu state file\n", load_state_.c_str());
        exit(1);
      }
      p += 8;
      uint64_t n = 0;
      memcpy(&n, p, 8);
      p += 8;
      if (static_cast<int64_t>(n) != m.n_state) {
        fprintf(stderr, "%s: %llu state leaves, %s expects %lld\n",
                load_state_.c_str(), static_cast<unsigned long long>(n),
                name.c_str(), static_cast<long long>(m.n_state));
        exit(1);
      }
      for (int64_t i = 0; i < m.n_state; i++) {
        uint64_t sz = 0;
        if (p + 8 > end) {
          fprintf(stderr, "%s: truncated\n", load_state_.c_str());
          exit(1);
        }
        memcpy(&sz, p, 8);
        p += 8;
        if (sz != static_cast<uint64_t>(m.inputs[i].bytes()) ||
            p + sz > end) {
          fprintf(stderr, "%s: leaf %lld is %llu bytes, expected %lld\n",
                  load_state_.c_str(), static_cast<long long>(i),
                  static_cast<unsigned long long>(sz),
                  static_cast<long long>(m.inputs[i].bytes()));
          exit(1);
        }
        m.state[i] = Upload(p, m.inputs[i]);
        p += sz;
      }
    }
    if (attrs_.empty()) return;
    const Json& ops_map = manifest_.at("attribute_ops");
    const Json& leaves = aot.at("state_leaves");
    if (leaves.kind != Json::kArr ||
        static_cast<int64_t>(leaves.arr.size()) != m.n_state) {
      fprintf(stderr,
              "artifact lacks state_leaves for %s — re-export with a "
              "framework version that writes them\n",
              name.c_str());
      exit(1);
    }
    for (const auto& attr : attrs_) {
      if (!ops_map.has(attr.name)) {
        fprintf(stderr, "artifact exposes no attribute '%s'\n",
                attr.name.c_str());
        exit(1);
      }
      for (const auto& op : ops_map.at(attr.name).arr) {
        const std::string& leaf = op.at("leaf").str;
        float fill = op.at("fill").kind == Json::kNull
                         ? attr.value
                         : static_cast<float>(op.at("fill").num);
        bool found = false;
        for (int64_t i = 0; i < m.n_state; i++) {
          const std::string& path = leaves.arr[i].str;
          bool match =
              path == leaf ||
              (path.size() > leaf.size() &&
               path[path.size() - leaf.size() - 1] == '/' &&
               path.compare(path.size() - leaf.size(), leaf.size(), leaf) ==
                   0);
          if (!match) continue;
          const TensorSpec& s = m.inputs[i];
          if (s.dtype != "float32") {
            fprintf(stderr, "attribute leaf %s is %s (want float32)\n",
                    path.c_str(), s.dtype.c_str());
            exit(1);
          }
          std::vector<float> host(s.elems(), fill);
          m.state[i] = Upload(host.data(), s);
          found = true;
        }
        if (!found)
          fprintf(stderr, "warning: attribute %s: no state leaf ends with "
                  "'%s'\n", attr.name.c_str(), leaf.c_str());
      }
    }
  }

  // Persist the current (post-run) streaming state: magic, leaf count,
  // then per-leaf {u64 byte size, raw data} in flat state order.
  void SaveState(Method& m, const std::string& path) {
    std::ofstream f(path, std::ios::binary);
    if (!f) {
      fprintf(stderr, "cannot write %s\n", path.c_str());
      exit(1);
    }
    f.write("RTPUST01", 8);
    uint64_t n = static_cast<uint64_t>(m.n_state);
    f.write(reinterpret_cast<char*>(&n), 8);
    for (int64_t i = 0; i < m.n_state; i++) {
      auto lit = ValueOrDie(m.state[i]->ToLiteralSync(), "state d2h");
      uint64_t sz = lit->size_bytes();
      f.write(reinterpret_cast<char*>(&sz), 8);
      f.write(reinterpret_cast<const char*>(lit->untyped_data()),
              static_cast<std::streamsize>(sz));
    }
  }

  std::unique_ptr<xla::PjRtBuffer> Upload(const void* data,
                                          const TensorSpec& spec) {
    return ValueOrDie(
        client_->BufferFromHostBuffer(
            data, DtypeToXla(spec.dtype), spec.shape, std::nullopt,
            xla::PjRtClient::HostBufferSemantics::kImmutableOnlyDuringCall,
            nullptr, mem_, /*device_layout=*/nullptr),
        "h2d");
  }

  // One streaming step: feeds (state..., x, seed), returns the primary
  // outputs on the host and retains the updated state on device.
  std::vector<std::vector<char>> Step(Method& m,
                                      const std::vector<const void*>& xs,
                                      uint32_t seed) {
    std::vector<std::unique_ptr<xla::PjRtBuffer>> owned;
    std::vector<xla::PjRtBuffer*> args;
    for (auto& s : m.state) args.push_back(s.get());
    size_t xi = 0;
    for (size_t i = m.n_state; i + 1 < m.inputs.size(); i++) {
      owned.push_back(Upload(xs[xi++], m.inputs[i]));
      args.push_back(owned.back().get());
    }
    TensorSpec seed_spec = m.inputs.back();
    owned.push_back(Upload(&seed, seed_spec));
    args.push_back(owned.back().get());

    std::vector<std::vector<xla::PjRtBuffer*>> all_args = {args};
    xla::ExecuteOptions eopts;
    auto all_outs = ValueOrDie(m.exe->Execute(absl::MakeSpan(all_args), eopts),
                               "execute");
    std::vector<std::unique_ptr<xla::PjRtBuffer>> outs =
        std::move(all_outs[0]);
    int64_t n_primary = static_cast<int64_t>(m.outputs.size()) - m.n_state;
    std::vector<std::vector<char>> primary;
    for (int64_t i = 0; i < n_primary; i++) {
      // ToLiteralSync (PJRT_Buffer_ToHostBuffer) rather than
      // CopyRawToHost: C-API plugins (libtpu/axon) don't implement the
      // raw path
      auto lit = ValueOrDie(outs[i]->ToLiteralSync(), "d2h");
      std::vector<char> host(m.outputs[i].bytes());
      if (static_cast<int64_t>(lit->size_bytes()) != m.outputs[i].bytes()) {
        fprintf(stderr, "output %lld: literal %zu bytes, expected %lld\n",
                static_cast<long long>(i), lit->size_bytes(),
                static_cast<long long>(m.outputs[i].bytes()));
        exit(1);
      }
      memcpy(host.data(), lit->untyped_data(), host.size());
      primary.push_back(std::move(host));
    }
    // updated state stays on device for the next call
    for (int64_t i = 0; i < m.n_state; i++)
      m.state[i] = std::move(outs[n_primary + i]);
    return primary;
  }

 public:
  void set_no_exe_cache(bool v) { no_exe_cache_ = v; }

 private:
  std::string dir_;
  Json manifest_;
  std::unique_ptr<xla::PjRtClient> client_;
  xla::PjRtMemorySpace* mem_;
  std::map<std::string, Method> methods_;
  std::vector<AttrOp> attrs_;
  std::string load_state_, save_state_;
  bool no_exe_cache_ = false;
};

std::vector<float> AsFloats(const std::vector<char>& raw) {
  std::vector<float> out(raw.size() / 4);
  memcpy(out.data(), raw.data(), raw.size());
  return out;
}

// Acklam's rational approximation of the inverse standard-normal CDF
// (|rel err| < 1.2e-9) — equals sqrt(2)*erfinv(2p-1), the prior's
// QuantizedNormal.to_normal (rave_tpu/prior/core.py).
double InvNormalCdf(double p) {
  static const double A[] = {-3.969683028665376e+01, 2.209460984245205e+02,
                             -2.759285104469687e+02, 1.383577518672690e+02,
                             -3.066479806614716e+01, 2.506628277459239e+00};
  static const double B[] = {-5.447609879822406e+01, 1.615858368580409e+02,
                             -1.556989798598866e+02, 6.680131188771972e+01,
                             -1.328068155288572e+01};
  static const double C[] = {-7.784894002430293e-03, -3.223964580411365e-01,
                             -2.400758277161838e+00, -2.549732539343734e+00,
                             4.374664141464968e+00,  2.938163982698783e+00};
  static const double D[] = {7.784695709041462e-03, 3.224671290700398e-01,
                             2.445134137142996e+00, 3.754408661907416e+00};
  const double plow = 0.02425, phigh = 1 - plow;
  if (p <= 0) return -HUGE_VAL;
  if (p >= 1) return HUGE_VAL;
  double q, r;
  if (p < plow) {
    q = sqrt(-2 * log(p));
    return (((((C[0] * q + C[1]) * q + C[2]) * q + C[3]) * q + C[4]) * q +
            C[5]) /
           ((((D[0] * q + D[1]) * q + D[2]) * q + D[3]) * q + 1);
  }
  if (p <= phigh) {
    q = p - 0.5;
    r = q * q;
    return (((((A[0] * r + A[1]) * r + A[2]) * r + A[3]) * r + A[4]) * r +
            A[5]) *
           q /
           (((((B[0] * r + B[1]) * r + B[2]) * r + B[3]) * r + B[4]) * r + 1);
  }
  q = sqrt(-2 * log(1 - p));
  return -(((((C[0] * q + C[1]) * q + C[2]) * q + C[3]) * q + C[4]) * q +
           C[5]) /
         ((((D[0] * q + D[1]) * q + D[2]) * q + D[3]) * q + 1);
}

int Fail(const char* msg) {
  fprintf(stderr, "%s\n", msg);
  return 1;
}

}  // namespace

int main(int argc, char** argv) {
  // leading options: --plugin <pjrt_plugin.so> [--opt key=value ...]
  //                  --no-dither (prior decode without dither, for tests)
  std::string plugin;
  bool no_dither = false;
  bool no_exe_cache = false;
  absl::flat_hash_map<std::string, xla::PjRtValueType> plugin_opts;
  std::vector<AttrOp> attrs;
  std::string load_state, save_state;
  std::vector<char*> pos;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--plugin" && i + 1 < argc) {
      plugin = argv[++i];
    } else if (a == "--no-dither") {
      no_dither = true;
    } else if (a == "--no-exe-cache") {
      no_exe_cache = true;
    } else if (a == "--attr" && i + 1 < argc) {
      std::string kv = argv[++i];
      size_t eq = kv.find('=');
      AttrOp op;
      op.name = eq == std::string::npos ? kv : kv.substr(0, eq);
      op.value = eq == std::string::npos
                     ? 1.f
                     : static_cast<float>(atof(kv.substr(eq + 1).c_str()));
      attrs.push_back(std::move(op));
    } else if (a == "--save-state" && i + 1 < argc) {
      save_state = argv[++i];
    } else if (a == "--load-state" && i + 1 < argc) {
      load_state = argv[++i];
    } else if (a == "--opt" && i + 1 < argc) {
      std::string kv = argv[++i];
      size_t eq = kv.find('=');
      if (eq == std::string::npos) return Fail("--opt expects key=value");
      std::string k = kv.substr(0, eq), v = kv.substr(eq + 1);
      char* end = nullptr;
      long long n = strtoll(v.c_str(), &end, 10);
      if (end && *end == '\0' && !v.empty())
        plugin_opts[k] = static_cast<int64_t>(n);
      else if (v == "true" || v == "false")
        plugin_opts[k] = (v == "true");
      else
        plugin_opts[k] = v;
    } else {
      pos.push_back(argv[i]);
    }
  }
  argc = static_cast<int>(pos.size()) + 1;
  std::vector<char*> rebased = {argv[0]};
  rebased.insert(rebased.end(), pos.begin(), pos.end());
  argv = rebased.data();
  if (argc < 3) {
    fprintf(stderr,
            "usage: rtpu_host [--plugin pjrt.so [--opt k=v ...]]\n"
            "                 [--attr name[=v] ...] [--load-state f] "
            "[--save-state f] [--no-exe-cache] <model.rtpu> <command>\n"
            "commands:\n"
            "  info\n"
            "  forward <in.wav> <out.wav> [seed]\n"
            "  encode <in.wav> <latents.f32> [seed]\n"
            "  decode <latents.f32> <out.wav> [seed]\n"
            "  prior <n_frames> <latents.f32> [seed]\n"
            "  bench [n_blocks] [forward|encode|decode]\n");
    return 1;
  }
  std::string dir = argv[1], cmd = argv[2];
  RtpuHost host(dir, plugin, plugin_opts);
  host.set_no_exe_cache(no_exe_cache);
  host.SetStateOptions(std::move(attrs), load_state, save_state);
  const Json& man = host.manifest();
  int64_t block = man.at("block_size").i64();
  int64_t sr = man.at("sampling_rate").i64();
  int64_t n_channels = man.at("n_channels").i64();
  int64_t latent = man.at("latent_size").i64();
  int64_t stream_batch = man.at("stream_batch").i64();
  int64_t frames_per_block =
      static_cast<int64_t>(block / (sr / man.at("latent_rate_hz").num) + 0.5);

  if (cmd == "info") {
    printf("name: %s\n", man.at("name").str.c_str());
    printf("sampling_rate: %lld\n", static_cast<long long>(sr));
    printf("block_size: %lld\n", static_cast<long long>(block));
    printf("n_channels: %lld\n", static_cast<long long>(n_channels));
    printf("latent_size: %lld\n", static_cast<long long>(latent));
    printf("latent_family: %s\n", man.at("latent_family").str.c_str());
    printf("frames_per_block: %lld\n",
           static_cast<long long>(frames_per_block));
    printf("total_latency_samples: %lld\n",
           static_cast<long long>(man.at("latency").at("total_samples").i64()));
    const Json& aot = man.at("aot");
    for (const auto& kv : aot.obj)
      printf("aot_method: %s%s\n", kv.first.c_str(),
             kv.second.has("mlir_file") ? "" : " (unavailable)");
    for (const auto& a : man.at("attributes").arr)
      printf("attribute: %s\n", a.str.c_str());
    return 0;
  }

  if (cmd == "bench") {
    // End-to-end per-block method latency through this host — upload,
    // execute, fetch, state retained on device — i.e. what an audio
    // callback would pay. Realtime budget = block_size / sampling_rate.
    int64_t n_blocks = argc > 3 ? atoll(argv[3]) : 256;
    std::string which = argc > 4 ? argv[4] : "forward";
    Method& m = host.Load(which + "_step");
    std::vector<float> xblock(m.inputs[m.n_state].elems());
    std::mt19937 rng(17);
    std::normal_distribution<float> nrm(0.f, 0.1f);
    std::vector<double> ms;
    ms.reserve(n_blocks);
    for (int64_t bi = -8; bi < n_blocks; bi++) {  // 8 warmup blocks
      for (auto& v : xblock) v = nrm(rng);
      auto t0 = std::chrono::steady_clock::now();
      host.Step(m, {xblock.data()}, static_cast<uint32_t>(bi + 8));
      auto t1 = std::chrono::steady_clock::now();
      if (bi >= 0)
        ms.push_back(
            std::chrono::duration<double, std::milli>(t1 - t0).count());
    }
    std::sort(ms.begin(), ms.end());
    double sum = 0;
    for (double v : ms) sum += v;
    double p50 = ms[ms.size() / 2], p95 = ms[ms.size() * 95 / 100];
    double budget_ms = 1000.0 * block / sr;
    printf("blocks: %lld x %lld samples (budget %.2f ms/block)\n",
           static_cast<long long>(n_blocks), static_cast<long long>(block),
           budget_ms);
    printf("per-block %s: p50 %.3f ms  p95 %.3f ms  mean %.3f ms\n",
           which.c_str(), p50, p95, sum / ms.size());
    printf("realtime headroom: %.1fx (p50), %.1fx (p95)\n", budget_ms / p50,
           budget_ms / p95);
    return 0;
  }

  if (stream_batch != 1)
    return Fail("this host streams stream_batch=1 artifacts (mono/multi-"
                "channel signal batch 1); stereo-batched artifacts need a "
                "batch-2 driver");
  if (argc < 5) return Fail("missing input/output paths");
  std::string in_path = argv[3], out_path = argv[4];
  uint32_t seed_base = argc > 5 ? static_cast<uint32_t>(atoll(argv[5])) : 0;

  if (cmd == "forward" || cmd == "encode") {
    Wav wav;
    if (!ReadWav(in_path, &wav)) return Fail("cannot read input wav");
    if (wav.sample_rate != sr)
      fprintf(stderr, "warning: wav rate %d != model rate %lld (no resampling)\n",
              wav.sample_rate, static_cast<long long>(sr));
    // channel adaptation: repeat or truncate to n_channels
    int64_t T = wav.n_frames();
    std::vector<float> x(static_cast<size_t>(T) * n_channels);
    for (int64_t t = 0; t < T; t++)
      for (int64_t c = 0; c < n_channels; c++)
        x[t * n_channels + c] = wav.frames[t * wav.channels +
                                           (c % wav.channels)];
    int64_t n_blocks = (T + block - 1) / block;
    Method& m = host.Load(cmd == "forward" ? "forward_step" : "encode_step");

    std::vector<float> out;
    std::vector<float> xblock(static_cast<size_t>(block) * n_channels);
    for (int64_t bi = 0; bi < n_blocks; bi++) {
      std::fill(xblock.begin(), xblock.end(), 0.f);
      int64_t n = std::min(block, T - bi * block);
      memcpy(xblock.data(), x.data() + bi * block * n_channels,
             static_cast<size_t>(n) * n_channels * sizeof(float));
      auto primary = host.Step(m, {xblock.data()},
                               seed_base + static_cast<uint32_t>(bi));
      auto y = AsFloats(primary[0]);
      out.insert(out.end(), y.begin(), y.end());
    }
    if (!host.save_state_path().empty())
      host.SaveState(m, host.save_state_path());

    if (cmd == "forward") {
      Wav w;
      w.sample_rate = static_cast<int>(sr);
      w.channels = static_cast<int>(n_channels);
      w.frames.assign(out.begin(),
                      out.begin() + std::min<size_t>(out.size(),
                                                     static_cast<size_t>(T) *
                                                         n_channels));
      if (!WriteWav(out_path, w)) return Fail("cannot write output wav");
      printf("wrote %s: %lld frames x %lld ch @ %lld Hz\n", out_path.c_str(),
             static_cast<long long>(w.n_frames()),
             static_cast<long long>(n_channels), static_cast<long long>(sr));
    } else {
      std::ofstream f(out_path, std::ios::binary);
      f.write(reinterpret_cast<char*>(out.data()), out.size() * 4);
      printf("wrote %s: [%lld, %lld] float32 latents (%.2f Hz)\n",
             out_path.c_str(), static_cast<long long>(out.size() / latent),
             static_cast<long long>(latent), man.at("latent_rate_hz").num);
    }
    return 0;
  }

  if (cmd == "decode") {
    std::string raw = ReadFile(in_path);
    int64_t total_frames = static_cast<int64_t>(raw.size() / 4 / latent);
    if (total_frames == 0) return Fail("latent file too small");
    const float* z = reinterpret_cast<const float*>(raw.data());
    Method& m = host.Load("decode_step");
    int64_t n_blocks = (total_frames + frames_per_block - 1) / frames_per_block;
    std::vector<float> out;
    std::vector<float> zblock(static_cast<size_t>(frames_per_block) * latent);
    for (int64_t bi = 0; bi < n_blocks; bi++) {
      std::fill(zblock.begin(), zblock.end(), 0.f);
      int64_t n = std::min(frames_per_block,
                           total_frames - bi * frames_per_block);
      memcpy(zblock.data(), z + bi * frames_per_block * latent,
             static_cast<size_t>(n) * latent * sizeof(float));
      auto primary = host.Step(m, {zblock.data()},
                               seed_base + static_cast<uint32_t>(bi));
      auto y = AsFloats(primary[0]);
      out.insert(out.end(), y.begin(), y.end());
    }
    if (!host.save_state_path().empty())
      host.SaveState(m, host.save_state_path());
    Wav w;
    w.sample_rate = static_cast<int>(sr);
    w.channels = static_cast<int>(n_channels);
    w.frames = std::move(out);
    if (!WriteWav(out_path, w)) return Fail("cannot write output wav");
    printf("wrote %s: %lld frames x %lld ch @ %lld Hz\n", out_path.c_str(),
           static_cast<long long>(w.n_frames()),
           static_cast<long long>(n_channels), static_cast<long long>(sr));
    return 0;
  }

  if (cmd == "prior") {
    // rtpu_host <art> prior <n_frames> <latents.f32> [seed] — sample the
    // bundled autoregressive prior into decode-ready latents (the
    // reference exposes the same "prior" method on the .ts artifact).
    if (!man.has("prior") || man.at("prior").kind != Json::kObj)
      return Fail("artifact was exported without a prior");
    int64_t n_frames = atoll(in_path.c_str());
    if (n_frames <= 0) return Fail("prior: n_frames must be positive");
    const Json& pc = man.at("prior");
    int64_t D = pc.at("latent_size").i64();
    int64_t R = pc.at("resolution").i64();
    Method& m = host.Load("prior_step");
    int64_t n_steps = n_frames + D - 1;
    // autoregress: x0 = zeros, feed each sampled one-hot back in
    std::vector<float> ys(static_cast<size_t>(n_steps) * D * R);
    std::vector<float> x(static_cast<size_t>(D) * R, 0.f);
    for (int64_t i = 0; i < n_steps; i++) {
      auto primary = host.Step(m, {x.data()},
                               seed_base + static_cast<uint32_t>(i));
      auto nxt = AsFloats(primary[0]);
      memcpy(&ys[i * D * R], nxt.data(), nxt.size() * sizeof(float));
      memcpy(x.data(), nxt.data(), nxt.size() * sizeof(float));
    }
    if (!host.save_state_path().empty())
      host.SaveState(m, host.save_state_path());
    // QuantizedNormal.decode (+ optional dither) then DiagonalShift
    // inverse: out[t, d] = to_normal(argmax(ys[t + d, d*R..]) / R)
    // (rave_tpu/prior/core.py; inverse shift reduces length by D-1)
    std::mt19937 rng(seed_base ^ 0x9E3779B9u);
    std::uniform_real_distribution<float> uni(0.f, 1.f);
    std::vector<float> z(static_cast<size_t>(n_frames) * D);
    for (int64_t t = 0; t < n_frames; t++) {
      for (int64_t d = 0; d < D; d++) {
        const float* row = &ys[(t + d) * D * R + d * R];
        int64_t best = 0;
        for (int64_t r = 1; r < R; r++)
          if (row[r] > row[best]) best = r;
        double q = static_cast<double>(best) / R;
        if (!no_dither) q += uni(rng) / R;
        double v = InvNormalCdf(q);
        z[t * D + d] =
            static_cast<float>(v < -4.0 ? -4.0 : (v > 4.0 ? 4.0 : v));
      }
    }
    // pad to the artifact's latent width with N(0,1) (sample_prior parity)
    std::vector<float> out(static_cast<size_t>(n_frames) * latent);
    std::normal_distribution<float> nrm(0.f, 1.f);
    for (int64_t t = 0; t < n_frames; t++)
      for (int64_t l = 0; l < latent; l++)
        out[t * latent + l] = l < D ? z[t * D + l] : nrm(rng);
    std::ofstream f(out_path, std::ios::binary);
    f.write(reinterpret_cast<char*>(out.data()), out.size() * 4);
    printf("wrote %s: [%lld, %lld] float32 latents from the prior\n",
           out_path.c_str(), static_cast<long long>(n_frames),
           static_cast<long long>(latent));
    return 0;
  }

  return Fail("unknown command");
}
