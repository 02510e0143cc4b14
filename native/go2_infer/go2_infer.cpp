// go2_infer: dependency-free C++ policy inference for deployment.
//
// The reference's real-robot loop runs policies through the TorchScript C++
// runtime (deploy_real_go2.py loads a .pt via libtorch). This shim replaces
// that native dependency: it loads either the framework's .g2p binary export
// (go2_rl_gym_tpu/export/native.py; CTS + MoE-CTS fast paths) or any of the
// framework's native ONNX artifacts (export/onnx_native.py; ALL SIX policy
// families via the bundled onnx_runtime.cpp executor — dispatch on the
// ".onnx" extension) and serves 50 Hz single-observation inference with the
// embedded 5-frame history ring buffer.
//
// C ABI (ctypes-friendly):
//   void* go2_policy_load(const char* path);
//   void  go2_policy_reset(void* handle);
//   int   go2_policy_infer(void* handle, const float* obs, float* action_out);
//   int   go2_policy_num_obs(void* handle);
//   int   go2_policy_num_actions(void* handle);
//   void  go2_policy_free(void* handle);
//
// Build: g++ -O2 -shared -fPIC -o libgo2_infer.so go2_infer.cpp \
//            onnx_runtime.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "onnx_runtime.h"

namespace {

struct PolicyBase {
  virtual ~PolicyBase() = default;
  virtual void reset() = 0;
  // returns 0 on success, nonzero on execution failure
  virtual int infer(const float* obs, float* action_out) = 0;
  virtual int obs_dim() const = 0;
  virtual int act_dim() const = 0;
};

constexpr uint32_t kMagic = 0x47325031;  // "G2P1"

enum Family : uint32_t {
  FAMILY_CTS = 0,
  FAMILY_MOE_CTS = 1,
};

struct Linear {
  int in = 0, out = 0;
  std::vector<float> w;  // row-major (out, in)
  std::vector<float> b;

  void apply(const std::vector<float>& x, std::vector<float>& y) const {
    y.resize(out);
    for (int o = 0; o < out; ++o) {
      const float* row = w.data() + static_cast<size_t>(o) * in;
      float acc = b[o];
      for (int i = 0; i < in; ++i) acc += row[i] * x[i];
      y[o] = acc;
    }
  }
};

struct MLP {
  std::vector<Linear> layers;
  bool last_activation = false;

  void apply(const std::vector<float>& x, std::vector<float>& y) const {
    std::vector<float> cur = x, nxt;
    for (size_t l = 0; l < layers.size(); ++l) {
      layers[l].apply(cur, nxt);
      if (l + 1 < layers.size() || last_activation) {
        for (float& v : nxt) v = v > 0.f ? v : std::expm1(v);  // ELU
      }
      cur.swap(nxt);
    }
    y = cur;
  }
};

void l2norm(std::vector<float>& x) {
  float n = 0.f;
  for (float v : x) n += v * v;
  n = std::sqrt(n);
  if (n < 1e-12f) n = 1e-12f;
  for (float& v : x) v /= n;
}

void softmax(std::vector<float>& x) {
  float m = x[0];
  for (float v : x) m = std::max(m, v);
  float s = 0.f;
  for (float& v : x) {
    v = std::exp(v - m);
    s += v;
  }
  for (float& v : x) v /= s;
}

struct Policy : PolicyBase {
  uint32_t family = FAMILY_CTS;
  int num_obs = 45, num_actions = 12, history_length = 5;
  int expert_num = 0, expert_hidden = 0, latent_dim = 0;

  MLP student;        // cts
  MLP moe_backbone;   // moe_cts (trailing activation)
  std::vector<float> head_w;  // (E, H, latent)
  std::vector<float> head_b;  // (E, latent)
  MLP gating;
  MLP actor;

  std::vector<float> history;  // (history_length * num_obs) ring, oldest first

  void reset() override { std::fill(history.begin(), history.end(), 0.f); }
  int obs_dim() const override { return num_obs; }
  int act_dim() const override { return num_actions; }

  void update_history(const float* obs) {
    std::memmove(history.data(), history.data() + num_obs,
                 sizeof(float) * num_obs * (history_length - 1));
    std::memcpy(history.data() + num_obs * (history_length - 1), obs,
                sizeof(float) * num_obs);
  }

  void latent_from_history(std::vector<float>& latent) {
    if (family == FAMILY_CTS) {
      student.apply(history, latent);
      l2norm(latent);
      return;
    }
    // MoE: shared backbone -> per-expert heads, softmax gate over history
    std::vector<float> feats, gate;
    moe_backbone.apply(history, feats);  // (E * H)
    gating.apply(history, gate);         // (E)
    softmax(gate);
    latent.assign(latent_dim, 0.f);
    for (int e = 0; e < expert_num; ++e) {
      const float* fe = feats.data() + static_cast<size_t>(e) * expert_hidden;
      const float* we =
          head_w.data() + static_cast<size_t>(e) * expert_hidden * latent_dim;
      const float* be = head_b.data() + static_cast<size_t>(e) * latent_dim;
      for (int o = 0; o < latent_dim; ++o) {
        float acc = be[o];
        for (int h = 0; h < expert_hidden; ++h)
          acc += fe[h] * we[static_cast<size_t>(h) * latent_dim + o];
        latent[o] += gate[e] * acc;
      }
    }
    l2norm(latent);
  }

  int infer(const float* obs, float* action_out) override {
    update_history(obs);
    std::vector<float> latent;
    latent_from_history(latent);
    std::vector<float> x(latent.size() + num_obs);
    std::memcpy(x.data(), latent.data(), sizeof(float) * latent.size());
    std::memcpy(x.data() + latent.size(), obs, sizeof(float) * num_obs);
    std::vector<float> act;
    actor.apply(x, act);
    std::memcpy(action_out, act.data(), sizeof(float) * num_actions);
    return 0;
  }
};

bool read_exact(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

bool read_u32(FILE* f, uint32_t* v) { return read_exact(f, v, 4); }

bool read_floats(FILE* f, std::vector<float>& v, size_t n) {
  v.resize(n);
  return read_exact(f, v.data(), n * sizeof(float));
}

bool read_linear(FILE* f, Linear* lin) {
  uint32_t in, out;
  if (!read_u32(f, &in) || !read_u32(f, &out)) return false;
  lin->in = in;
  lin->out = out;
  return read_floats(f, lin->w, static_cast<size_t>(in) * out) &&
         read_floats(f, lin->b, out);
}

bool read_mlp(FILE* f, MLP* mlp) {
  uint32_t n, last_act;
  if (!read_u32(f, &n) || !read_u32(f, &last_act)) return false;
  mlp->last_activation = last_act != 0;
  mlp->layers.resize(n);
  for (uint32_t i = 0; i < n; ++i)
    if (!read_linear(f, &mlp->layers[i])) return false;
  return true;
}

// ONNX-artifact policy: stateless stacked-by-term graph + a per-frame
// history ring kept here (interface of export/onnx_native.py, reference
// exporter.py:238-262 flatten_obs with term dims [3,3,3,12,12,12]).
struct OnnxPolicy : PolicyBase {
  go2onnx::Graph* graph = nullptr;
  int num_obs = 45, num_actions = 12, history_length = 5;
  static constexpr int kTermDims[6] = {3, 3, 3, 12, 12, 12};
  std::vector<float> frames;  // (history_length, num_obs), oldest first

  ~OnnxPolicy() override {
    if (graph) go2onnx::free_graph(graph);
  }
  void reset() override { std::fill(frames.begin(), frames.end(), 0.f); }
  int obs_dim() const override { return num_obs; }
  int act_dim() const override { return num_actions; }

  int infer(const float* obs, float* action_out) override {
    std::memmove(frames.data(), frames.data() + num_obs,
                 sizeof(float) * num_obs * (history_length - 1));
    std::memcpy(frames.data() + num_obs * (history_length - 1), obs,
                sizeof(float) * num_obs);
    // frames (L, obs) -> stacked-by-term (term-major, frame-minor)
    go2onnx::Tensor in;
    in.f.resize(frames.size());
    size_t j = 0;
    int off = 0;
    for (int t = 0; t < 6; ++t) {
      for (int f = 0; f < history_length; ++f)
        for (int d = 0; d < kTermDims[t]; ++d)
          in.f[j++] = frames[static_cast<size_t>(f) * num_obs + off + d];
      off += kTermDims[t];
    }
    std::vector<go2onnx::Tensor> outs;
    if (!go2onnx::run_graph(*graph, {&in}, &outs) || outs.empty() ||
        outs[0].f.size() < static_cast<size_t>(num_actions))
      return -2;  // execution failure must not read as success upstream
    std::memcpy(action_out, outs[0].f.data(), sizeof(float) * num_actions);
    return 0;
  }
};
constexpr int OnnxPolicy::kTermDims[6];

OnnxPolicy* load_onnx(const char* path) {
  go2onnx::Graph* g = go2onnx::load_graph_file(path);
  if (!g) return nullptr;
  OnnxPolicy* p = new OnnxPolicy();
  p->graph = g;
  // this wrapper only supports the Go2 layout (45-dim obs, 5-frame
  // history, term dims [3,3,3,12,12,12]); refuse mismatched artifacts at
  // load instead of reading out of bounds at 50 Hz
  size_t want = static_cast<size_t>(p->history_length) * p->num_obs;
  size_t declared = go2onnx::input_width(*g);
  if (declared != 0 && declared != want) {
    delete p;
    return nullptr;
  }
  p->frames.assign(want, 0.f);
  return p;
}

Policy* load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  Policy* p = new Policy();
  uint32_t magic = 0, no, na, hl;
  bool ok = read_u32(f, &magic) && magic == kMagic &&
            read_u32(f, &p->family) && read_u32(f, &no) && read_u32(f, &na) &&
            read_u32(f, &hl);
  if (ok) {
    p->num_obs = no;
    p->num_actions = na;
    p->history_length = hl;
    if (p->family == FAMILY_CTS) {
      ok = read_mlp(f, &p->student);
    } else if (p->family == FAMILY_MOE_CTS) {
      uint32_t e, h, l;
      ok = read_u32(f, &e) && read_u32(f, &h) && read_u32(f, &l) &&
           read_mlp(f, &p->moe_backbone);
      if (ok) {
        p->expert_num = e;
        p->expert_hidden = h;
        p->latent_dim = l;
        ok = read_floats(f, p->head_w, static_cast<size_t>(e) * h * l) &&
             read_floats(f, p->head_b, static_cast<size_t>(e) * l) &&
             read_mlp(f, &p->gating);
      }
    } else {
      ok = false;
    }
  }
  if (ok) ok = read_mlp(f, &p->actor);
  std::fclose(f);
  if (!ok) {
    delete p;
    return nullptr;
  }
  p->history.assign(static_cast<size_t>(p->history_length) * p->num_obs, 0.f);
  return p;
}

}  // namespace

extern "C" {

void* go2_policy_load(const char* path) {
  std::string p(path ? path : "");
  if (p.size() > 5 && p.compare(p.size() - 5, 5, ".onnx") == 0)
    return static_cast<PolicyBase*>(load_onnx(path));
  return static_cast<PolicyBase*>(load(path));
}

void go2_policy_reset(void* handle) {
  if (handle) static_cast<PolicyBase*>(handle)->reset();
}

int go2_policy_infer(void* handle, const float* obs, float* action_out) {
  if (!handle) return -1;
  return static_cast<PolicyBase*>(handle)->infer(obs, action_out);
}

int go2_policy_num_obs(void* handle) {
  return handle ? static_cast<PolicyBase*>(handle)->obs_dim() : -1;
}

int go2_policy_num_actions(void* handle) {
  return handle ? static_cast<PolicyBase*>(handle)->act_dim() : -1;
}

void go2_policy_free(void* handle) { delete static_cast<PolicyBase*>(handle); }

}  // extern "C"
