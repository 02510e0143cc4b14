// Dependency-free ONNX policy executor for on-robot deployment.
//
// Loads the framework's native ONNX artifacts (export/onnx_native.py — the
// reference ONNX exporter's stateless stacked-by-term interface, reference
// legged_gym/utils/exporter.py:195-338) and serves 50 Hz single-observation
// inference for ALL SIX policy families without libtorch or onnxruntime.
// The protobuf wire-format subset and op set mirror onnx_native.py exactly;
// the surrounding Policy wrapper (go2_infer.cpp) keeps the per-frame history
// ring and assembles the stacked-by-term input the graph expects.
//
// Compiled into libgo2_infer.so together with go2_infer.cpp (see build cmd
// there); go2_policy_load dispatches on the ".onnx" extension.

#include "onnx_runtime.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>

namespace go2onnx {

// ---------------------------------------------------------------------------
// Protobuf wire reader (subset of onnx.proto3)
// ---------------------------------------------------------------------------

struct Slice {
  const uint8_t* p = nullptr;
  size_t n = 0;
};

static bool read_varint(Slice& s, size_t& i, uint64_t* v) {
  *v = 0;
  int shift = 0;
  while (i < s.n) {
    uint8_t b = s.p[i++];
    *v |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) return true;
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

// Parsed message: field number -> list of raw values. Varints stored in
// ints, length-delimited stored in subs.
struct Msg {
  std::multimap<int, uint64_t> ints;
  std::multimap<int, Slice> subs;
  std::multimap<int, float> f32s;

  std::vector<uint64_t> get_ints(int f) const {
    std::vector<uint64_t> out;
    auto r = ints.equal_range(f);
    for (auto it = r.first; it != r.second; ++it) out.push_back(it->second);
    return out;
  }
  std::vector<Slice> get_subs(int f) const {
    std::vector<Slice> out;
    auto r = subs.equal_range(f);
    for (auto it = r.first; it != r.second; ++it) out.push_back(it->second);
    return out;
  }
  bool first_sub(int f, Slice* out) const {
    auto it = subs.find(f);
    if (it == subs.end()) return false;
    *out = it->second;
    return true;
  }
  uint64_t first_int(int f, uint64_t dflt) const {
    auto it = ints.find(f);
    return it == ints.end() ? dflt : it->second;
  }
  float first_f32(int f, float dflt) const {
    auto it = f32s.find(f);
    return it == f32s.end() ? dflt : it->second;
  }
};

static bool parse_msg(Slice s, Msg* out) {
  size_t i = 0;
  while (i < s.n) {
    uint64_t key;
    if (!read_varint(s, i, &key)) return false;
    int field = static_cast<int>(key >> 3);
    int wt = static_cast<int>(key & 7);
    if (wt == 0) {  // varint
      uint64_t v;
      if (!read_varint(s, i, &v)) return false;
      out->ints.emplace(field, v);
    } else if (wt == 2) {  // length-delimited
      uint64_t len;
      if (!read_varint(s, i, &len) || i + len > s.n) return false;
      out->subs.emplace(field, Slice{s.p + i, static_cast<size_t>(len)});
      i += len;
    } else if (wt == 5) {  // 32-bit
      if (i + 4 > s.n) return false;
      float v;
      std::memcpy(&v, s.p + i, 4);
      out->f32s.emplace(field, v);
      i += 4;
    } else if (wt == 1) {  // 64-bit
      if (i + 8 > s.n) return false;
      i += 8;
    } else {
      return false;
    }
  }
  return true;
}

static std::string sub_str(const Slice& s) {
  return std::string(reinterpret_cast<const char*>(s.p), s.n);
}

static int64_t signed_varint(uint64_t v) {
  return static_cast<int64_t>(v);  // two's-complement for negatives
}

// All graph tensors are (1, D) f32 rows or 1-D int64 index lists (Tensor is
// declared in onnx_runtime.h).

struct Attr {
  float f = 0.f;
  bool has_f = false;
  int64_t i = 0;
  std::vector<int64_t> ints;
};

struct Node {
  std::string op;
  std::vector<std::string> inputs, outputs;
  std::map<std::string, Attr> attrs;
};

struct Graph {
  std::map<std::string, Tensor> inits;
  std::vector<Node> nodes;
  std::vector<std::string> input_names, output_names;
  std::vector<size_t> input_widths;  // parallel to input_names (0 = unknown)
};

static bool load_graph_impl(const std::string& path, Graph* g);

Graph* load_graph_file(const std::string& path) {
  Graph* g = new Graph();
  if (!load_graph_impl(path, g)) {
    delete g;
    return nullptr;
  }
  return g;
}
void free_graph(Graph* g) { delete g; }
size_t num_inputs(const Graph& g) { return g.input_names.size(); }
size_t num_outputs(const Graph& g) { return g.output_names.size(); }
size_t input_width(const Graph& g) {
  return g.input_widths.empty() ? 0 : g.input_widths[0];
}

// TensorProto fields: dims=1, data_type=2, name=8, raw_data=9
static bool parse_tensor(Slice s, std::string* name, Tensor* t) {
  Msg m;
  if (!parse_msg(s, &m)) return false;
  uint64_t dtype = m.first_int(2, 1);
  Slice nm;
  if (m.first_sub(8, &nm)) *name = sub_str(nm);
  Slice raw;
  if (!m.first_sub(9, &raw)) return false;
  if (dtype == 7) {  // INT64
    t->is_int = true;
    t->idx.resize(raw.n / 8);
    std::memcpy(t->idx.data(), raw.p, t->idx.size() * 8);
  } else {  // FLOAT
    t->f.resize(raw.n / 4);
    std::memcpy(t->f.data(), raw.p, t->f.size() * 4);
  }
  return true;
}

// AttributeProto: name=1, f=2, i=3, ints=8, type=20
static bool parse_attr(Slice s, std::string* name, Attr* a) {
  Msg m;
  if (!parse_msg(s, &m)) return false;
  Slice nm;
  if (!m.first_sub(1, &nm)) return false;
  *name = sub_str(nm);
  a->has_f = m.f32s.count(2) > 0;
  a->f = m.first_f32(2, 0.f);
  a->i = signed_varint(m.first_int(3, 0));
  // repeated int64 ints: unpacked (wiretype 0) or packed (wiretype 2 —
  // torch-exported models use packed; ADVICE r4)
  for (uint64_t v : m.get_ints(8)) a->ints.push_back(signed_varint(v));
  for (const Slice& packed : m.get_subs(8)) {
    Slice ps = packed;
    size_t i = 0;
    while (i < ps.n) {
      uint64_t v;
      if (!read_varint(ps, i, &v)) return false;
      a->ints.push_back(signed_varint(v));
    }
  }
  return true;
}

// NodeProto: input=1, output=2, op_type=4, attribute=5
static bool parse_node(Slice s, Node* n) {
  Msg m;
  if (!parse_msg(s, &m)) return false;
  for (const Slice& x : m.get_subs(1)) n->inputs.push_back(sub_str(x));
  for (const Slice& x : m.get_subs(2)) n->outputs.push_back(sub_str(x));
  Slice op;
  if (!m.first_sub(4, &op)) return false;
  n->op = sub_str(op);
  for (const Slice& x : m.get_subs(5)) {
    std::string an;
    Attr a;
    if (!parse_attr(x, &an, &a)) return false;
    n->attrs[an] = a;
  }
  return true;
}

// ValueInfoProto: name=1, type=2 (TypeProto: tensor_type=1 ->
// TensorShapeProto shape=2 -> Dimension dim=1 -> dim_value=1)
static std::string value_info_name(Slice s, size_t* width = nullptr) {
  Msg m;
  if (!parse_msg(s, &m)) return "";
  Slice nm;
  if (!m.first_sub(1, &nm)) return "";
  if (width) {
    *width = 0;
    Slice tp, tt, sh;
    if (m.first_sub(2, &tp)) {
      Msg mt;
      if (parse_msg(tp, &mt) && mt.first_sub(1, &tt)) {
        Msg mtt;
        if (parse_msg(tt, &mtt) && mtt.first_sub(2, &sh)) {
          Msg ms;
          if (parse_msg(sh, &ms)) {
            size_t w = 1;
            bool any = false;
            bool first = true;
            for (const Slice& d : ms.get_subs(1)) {
              Msg md;
              if (!parse_msg(d, &md)) continue;
              uint64_t dv = md.first_int(1, 0);
              if (first) {  // batch dim
                first = false;
                continue;
              }
              if (dv) {
                w *= static_cast<size_t>(dv);
                any = true;
              }
            }
            if (any) *width = w;
          }
        }
      }
    }
  }
  return sub_str(nm);
}

// GraphProto: node=1, initializer=5, input=11, output=12
// ModelProto: graph=7
static bool load_graph_impl(const std::string& path, Graph* g) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> blob((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  Msg model;
  if (!parse_msg(Slice{blob.data(), blob.size()}, &model)) return false;
  Slice gs;
  if (!model.first_sub(7, &gs)) return false;
  Msg gm;
  if (!parse_msg(gs, &gm)) return false;
  for (const Slice& s : gm.get_subs(5)) {
    std::string name;
    Tensor t;
    if (!parse_tensor(s, &name, &t)) return false;
    g->inits[name] = std::move(t);
  }
  for (const Slice& s : gm.get_subs(1)) {
    Node n;
    if (!parse_node(s, &n)) return false;
    // Load-time attribute validation (ADVICE r4): go2_policy_load dispatches
    // any .onnx path here, so a foreign-but-valid model with semantics this
    // executor does not implement must be REJECTED at load, not silently
    // mis-executed.
    if (n.op == "Gemm") {
      auto it = n.attrs.find("transB");
      if (it == n.attrs.end() || it->second.i != 1) return false;
      it = n.attrs.find("transA");
      if (it != n.attrs.end() && it->second.i != 0) return false;
      it = n.attrs.find("alpha");
      if (it != n.attrs.end() && it->second.has_f && it->second.f != 1.f)
        return false;
      it = n.attrs.find("beta");
      if (it != n.attrs.end() && it->second.has_f && it->second.f != 1.f)
        return false;
      if (n.inputs.size() < 3) return false;  // bias-less Gemm unsupported
    }
    g->nodes.push_back(std::move(n));
  }
  for (const Slice& s : gm.get_subs(11)) {
    size_t w = 0;
    g->input_names.push_back(value_info_name(s, &w));
    g->input_widths.push_back(w);
  }
  for (const Slice& s : gm.get_subs(12))
    g->output_names.push_back(value_info_name(s));
  return !g->input_names.empty() && !g->output_names.empty();
}

// ---------------------------------------------------------------------------
// Executor (op set of export/onnx_native.py)
// ---------------------------------------------------------------------------

static void broadcast_binop(const Tensor& a, const Tensor& b, Tensor* y,
                            float (*op)(float, float)) {
  size_t n = std::max(a.f.size(), b.f.size());
  y->f.resize(n);
  for (size_t i = 0; i < n; ++i) {
    float av = a.f[a.f.size() == 1 ? 0 : i];
    float bv = b.f[b.f.size() == 1 ? 0 : i];
    y->f[i] = op(av, bv);
  }
}

bool run_graph(const Graph& g, const std::vector<const Tensor*>& inputs,
               std::vector<Tensor>* outputs) {
  // no weight copies: initializers are referenced in place; produced
  // tensors live in a stable deque so pointers stay valid
  std::map<std::string, const Tensor*> env;
  for (const auto& kv : g.inits) env[kv.first] = &kv.second;
  for (size_t i = 0; i < g.input_names.size() && i < inputs.size(); ++i)
    env[g.input_names[i]] = inputs[i];
  std::deque<Tensor> storage;

  for (const Node& n : g.nodes) {
    std::vector<const Tensor*> x;
    for (const std::string& in : n.inputs) {
      auto it = env.find(in);
      if (it == env.end()) return false;
      x.push_back(it->second);
    }
    Tensor y;
    const std::string& op = n.op;
    if (op == "Gemm") {
      // x[0] (1, in); x[1] (out, in) [transB=1, validated at load]; x[2] (out)
      const auto& a = x[0]->f;
      const auto& w = x[1]->f;
      const auto& b = x[2]->f;
      size_t out = b.size(), in = a.size();
      // dimension check (ADVICE r4): a weight sized for a different input
      // width would read out of bounds / compute garbage
      if (out == 0 || in == 0 || w.size() != out * in) return false;
      y.f.resize(out);
      for (size_t o = 0; o < out; ++o) {
        const float* row = w.data() + o * in;
        float acc = b[o];
        for (size_t i = 0; i < in; ++i) acc += row[i] * a[i];
        y.f[o] = acc;
      }
    } else if (op == "Elu") {
      y.f = x[0]->f;
      for (float& v : y.f) v = v > 0.f ? v : std::expm1(v);
    } else if (op == "Relu") {
      y.f = x[0]->f;
      for (float& v : y.f) v = std::max(v, 0.f);
    } else if (op == "Tanh") {
      y.f = x[0]->f;
      for (float& v : y.f) v = std::tanh(v);
    } else if (op == "Sigmoid") {
      y.f = x[0]->f;
      for (float& v : y.f) v = 1.f / (1.f + std::exp(-v));
    } else if (op == "Softmax") {
      y.f = x[0]->f;
      float m = *std::max_element(y.f.begin(), y.f.end());
      float s = 0.f;
      for (float& v : y.f) {
        v = std::exp(v - m);
        s += v;
      }
      for (float& v : y.f) v /= s;
    } else if (op == "Gather") {
      // axis-1 gather on a (1, D) row (or axis-0 on a 1-D index list)
      const Tensor& data = *x[0];
      const Tensor& ind = *x[1];
      // index bounds check (ADVICE r4): reject instead of reading OOB
      if (data.is_int) {
        y.is_int = true;
        y.idx.reserve(ind.idx.size());
        for (int64_t i : ind.idx) {
          if (i < 0 || static_cast<size_t>(i) >= data.idx.size()) return false;
          y.idx.push_back(data.idx[i]);
        }
      } else {
        y.f.reserve(ind.idx.size());
        for (int64_t i : ind.idx) {
          if (i < 0 || static_cast<size_t>(i) >= data.f.size()) return false;
          y.f.push_back(data.f[i]);
        }
      }
    } else if (op == "Concat") {
      for (const Tensor* t : x) y.f.insert(y.f.end(), t->f.begin(), t->f.end());
    } else if (op == "Mul") {
      broadcast_binop(*x[0], *x[1], &y, [](float a, float b) { return a * b; });
    } else if (op == "Add") {
      broadcast_binop(*x[0], *x[1], &y, [](float a, float b) { return a + b; });
    } else if (op == "Sub") {
      broadcast_binop(*x[0], *x[1], &y, [](float a, float b) { return a - b; });
    } else if (op == "Div") {
      broadcast_binop(*x[0], *x[1], &y, [](float a, float b) { return a / b; });
    } else if (op == "Max") {
      broadcast_binop(*x[0], *x[1], &y,
                      [](float a, float b) { return std::max(a, b); });
    } else if (op == "Sqrt") {
      y.f = x[0]->f;
      for (float& v : y.f) v = std::sqrt(v);
    } else if (op == "Exp") {
      y.f = x[0]->f;
      for (float& v : y.f) v = std::exp(v);
    } else if (op == "Clip") {
      y.f = x[0]->f;
      float lo = x.size() > 1 && !x[1]->f.empty() ? x[1]->f[0] : -1e30f;
      float hi = x.size() > 2 && !x[2]->f.empty() ? x[2]->f[0] : 1e30f;
      for (float& v : y.f) v = std::min(std::max(v, lo), hi);
    } else if (op == "ReduceSum") {
      float s = 0.f;
      for (float v : x[0]->f) s += v;
      y.f.assign(1, s);
    } else if (op == "Identity") {
      y = *x[0];
    } else {
      return false;  // unsupported op
    }
    if (!n.outputs.empty()) {
      storage.push_back(std::move(y));
      env[n.outputs[0]] = &storage.back();
    }
  }

  outputs->clear();
  for (const std::string& out : g.output_names) {
    auto it = env.find(out);
    if (it == env.end()) return false;
    outputs->push_back(*it->second);
  }
  return true;
}

}  // namespace go2onnx
