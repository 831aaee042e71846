// slamio — native dataset-IO hot path for ct_icp_tpu.
//
// Native counterpart of the reference's C++ IO layer (reference
// src/SlamCore/io.cxx tinyply reader, src/ct_icp/dataset.cpp NCLTIterator):
// the host side of the TPU pipeline is IO/decode-bound (PLY vertex blocks,
// NCLT packed uint16 hit streams), so these decoders are C++ with a plain
// C ABI consumed from Python via ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libslamio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

struct Property {
  std::string name;
  int size = 0;       // bytes
  char kind = 'f';    // 'f' float, 'i' int, 'u' uint
};

int prop_size(const std::string& t) {
  if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
  if (t == "short" || t == "int16" || t == "ushort" || t == "uint16") return 2;
  if (t == "int" || t == "int32" || t == "uint" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  return 0;
}

char prop_kind(const std::string& t) {
  if (t == "float" || t == "float32" || t == "double" || t == "float64")
    return 'f';
  if (t[0] == 'u') return 'u';
  return 'i';
}

double read_as_double(const uint8_t* p, const Property& prop) {
  switch (prop.kind) {
    case 'f':
      if (prop.size == 4) { float v; std::memcpy(&v, p, 4); return v; }
      else { double v; std::memcpy(&v, p, 8); return v; }
    case 'u':
      if (prop.size == 1) return *p;
      else if (prop.size == 2) { uint16_t v; std::memcpy(&v, p, 2); return v; }
      else { uint32_t v; std::memcpy(&v, p, 4); return v; }
    default:
      if (prop.size == 1) return *reinterpret_cast<const int8_t*>(p);
      else if (prop.size == 2) { int16_t v; std::memcpy(&v, p, 2); return v; }
      else { int32_t v; std::memcpy(&v, p, 4); return v; }
  }
}

}  // namespace

extern "C" {

// Decode the vertex element of a binary_little_endian PLY file.
//   xyz_out:  [cap * 3] float64
//   t_out:    [cap] float64 (untouched if no timestamp-like property)
// Returns the number of points, -1 on error, -2 if ascii/unsupported format.
// has_time_out receives 1 when a timestamp property was found.
long ply_read_xyzt(const char* path, double* xyz_out, double* t_out, long cap,
                   int* has_time_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char line[4096];
  bool in_vertex = false;
  long vertex_count = -1;
  std::vector<Property> props;
  bool little = true;
  bool binary = false;

  while (std::fgets(line, sizeof(line), f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("format", 0) == 0) {
      binary = s.find("binary") != std::string::npos;
      little = s.find("little") != std::string::npos;
    } else if (s.rfind("element", 0) == 0) {
      in_vertex = s.find("vertex") != std::string::npos;
      if (in_vertex) {
        vertex_count = std::strtol(s.c_str() + s.rfind(' ') + 1, nullptr, 10);
      } else if (vertex_count >= 0) {
        // a later element: we only read vertex, which must come first
        in_vertex = false;
      }
    } else if (s.rfind("property", 0) == 0 && in_vertex) {
      char t[64], n[512];
      if (std::sscanf(s.c_str(), "property %63s %511s", t, n) == 2) {
        if (std::string(t) == "list") { std::fclose(f); return -2; }
        Property p;
        p.name = n;
        p.size = prop_size(t);
        p.kind = prop_kind(t);
        if (p.size == 0) { std::fclose(f); return -2; }
        props.push_back(p);
      }
    } else if (s.rfind("end_header", 0) == 0) {
      break;
    }
  }
  if (!binary || !little || vertex_count < 0) { std::fclose(f); return -2; }

  long stride = 0;
  long off_x = -1, off_y = -1, off_z = -1, off_t = -1;
  Property px, py, pz, pt;
  for (auto& p : props) {
    if (p.name == "x") { off_x = stride; px = p; }
    if (p.name == "y") { off_y = stride; py = p; }
    if (p.name == "z") { off_z = stride; pz = p; }
    if (p.name == "timestamp" || p.name == "t" || p.name == "time" ||
        p.name == "scalar_timestamp") {
      if (off_t < 0) { off_t = stride; pt = p; }
    }
    stride += p.size;
  }
  if (off_x < 0 || off_y < 0 || off_z < 0) { std::fclose(f); return -2; }

  long n = vertex_count < cap ? vertex_count : cap;
  std::vector<uint8_t> buf(static_cast<size_t>(stride) * n);
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  n = static_cast<long>(got / stride) < n ? static_cast<long>(got / stride) : n;

  const uint8_t* base = buf.data();
  for (long i = 0; i < n; ++i) {
    const uint8_t* row = base + static_cast<size_t>(i) * stride;
    xyz_out[i * 3 + 0] = read_as_double(row + off_x, px);
    xyz_out[i * 3 + 1] = read_as_double(row + off_y, py);
    xyz_out[i * 3 + 2] = read_as_double(row + off_z, pz);
    if (off_t >= 0) t_out[i] = read_as_double(row + off_t, pt);
  }
  *has_time_out = off_t >= 0 ? 1 : 0;
  return n;
}

// ----------------------------------------------------------- NCLT stream —
// Stateful reader over velodyne_hits.bin (reference dataset.cpp:494-535):
// batches of [4x u16 magic==44444][u32 num_hits][u64 utime][u32 padding]
// then num_hits * [3x u16 xyz][2x u8], xyz decoded v*0.005-100.

struct NcltReader {
  FILE* f = nullptr;
};

void* nclt_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new NcltReader();
  r->f = f;
  return r;
}

void nclt_close(void* handle) {
  auto* r = static_cast<NcltReader*>(handle);
  if (r) {
    if (r->f) std::fclose(r->f);
    delete r;
  }
}

// Read up to num_batches batches; decode points into xyz_out [cap*3] f64 and
// ts_out [cap] f64 (per-batch utime). skip!=0 discards the data.
// Returns number of points decoded, -1 on EOF-before-any-batch, -2 bad magic.
long nclt_read(void* handle, int num_batches, int skip, double* xyz_out,
               double* ts_out, long cap) {
  auto* r = static_cast<NcltReader*>(handle);
  if (!r || !r->f) return -1;
  long total = 0;
  int batches_read = 0;
  for (int b = 0; b < num_batches; ++b) {
    uint16_t magic[4];
    if (std::fread(magic, 2, 4, r->f) != 4) break;
    for (int i = 0; i < 4; ++i)
      if (magic[i] != 44444) return -2;
    uint32_t num_hits, padding;
    uint64_t utime;
    if (std::fread(&num_hits, 4, 1, r->f) != 1) break;
    if (std::fread(&utime, 8, 1, r->f) != 1) break;
    if (std::fread(&padding, 4, 1, r->f) != 1) break;
    size_t nbytes = static_cast<size_t>(num_hits) * 8;
    if (skip || total + static_cast<long>(num_hits) > cap) {
      if (std::fseek(r->f, static_cast<long>(nbytes), SEEK_CUR) != 0) break;
      batches_read++;
      continue;
    }
    std::vector<uint8_t> buf(nbytes);
    if (std::fread(buf.data(), 1, nbytes, r->f) != nbytes) break;
    for (uint32_t i = 0; i < num_hits; ++i) {
      const uint8_t* p = buf.data() + static_cast<size_t>(i) * 8;
      uint16_t xyz[3];
      std::memcpy(xyz, p, 6);
      xyz_out[(total + i) * 3 + 0] = xyz[0] * 0.005 - 100.0;
      xyz_out[(total + i) * 3 + 1] = xyz[1] * 0.005 - 100.0;
      xyz_out[(total + i) * 3 + 2] = xyz[2] * 0.005 - 100.0;
      ts_out[total + i] = static_cast<double>(utime);
    }
    total += num_hits;
    batches_read++;
  }
  if (batches_read == 0) return -1;
  return total;
}

}  // extern "C"
