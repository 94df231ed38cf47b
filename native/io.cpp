// Native IO for reduced_3dgs_tpu: fast binary PLY read/write and COLMAP
// sparse-model parsing.
//
// The reference's native layer is CUDA compute (SURVEY.md section 2); its
// host-side IO is python (plyfile). For the TPU framework the compute lives
// in XLA/Pallas, so the native niche is the data path: multi-million-point
// PLY files and COLMAP binary models parsed at memcpy speed instead of
// through numpy record-array shuffling. Exposed through a C ABI consumed via
// ctypes (reduced_3dgs_tpu/models/native_io.py); the numpy implementation
// remains the always-available fallback and behavioral spec.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

struct Property {
    std::string name;
    int dtype;   // 0:i1 1:u1 2:i2 3:u2 4:i4 5:u4 6:f4 7:f8
};

int dtype_size(int d) {
    switch (d) {
        case 0: case 1: return 1;
        case 2: case 3: return 2;
        case 4: case 5: case 6: return 4;
        default: return 8;
    }
}

int parse_dtype(const std::string& s) {
    if (s == "char" || s == "int8") return 0;
    if (s == "uchar" || s == "uint8") return 1;
    if (s == "short" || s == "int16") return 2;
    if (s == "ushort" || s == "uint16") return 3;
    if (s == "int" || s == "int32") return 4;
    if (s == "uint" || s == "uint32") return 5;
    if (s == "float" || s == "float32") return 6;
    if (s == "double" || s == "float64") return 7;
    return -1;
}

struct Element {
    std::string name;
    uint64_t count = 0;
    std::vector<Property> props;
    uint64_t row_size() const {
        uint64_t s = 0;
        for (auto& p : props) s += dtype_size(p.dtype);
        return s;
    }
};

struct PlyFile {
    std::vector<Element> elements;
    std::vector<std::vector<char>> element_data;  // column-contiguous rows
    std::string error;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- PLY read
// Parses a binary_little_endian PLY. Returns an opaque handle (or null).
void* r3dgs_ply_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    auto* ply = new PlyFile();

    char line[4096];
    bool in_header = true;
    bool binary_le = false;
    while (in_header && fgets(line, sizeof(line), f)) {
        std::string s(line);
        while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
        if (s.rfind("format ", 0) == 0) {
            binary_le = s.find("binary_little_endian") != std::string::npos;
        } else if (s.rfind("element ", 0) == 0) {
            Element e;
            char name[256];
            unsigned long long cnt;
            if (sscanf(s.c_str(), "element %255s %llu", name, &cnt) == 2) {
                e.name = name;
                e.count = cnt;
                ply->elements.push_back(e);
            }
        } else if (s.rfind("property ", 0) == 0 && !ply->elements.empty()) {
            char type[64], name[256];
            if (sscanf(s.c_str(), "property %63s %255s", type, name) == 2) {
                int dt = parse_dtype(type);
                if (dt < 0) { ply->error = "unsupported property type"; }
                ply->elements.back().props.push_back({name, dt});
            }
        } else if (s == "end_header") {
            in_header = false;
        }
    }
    if (in_header || !binary_le || !ply->error.empty()) {
        fclose(f);
        delete ply;
        return nullptr;
    }
    for (auto& e : ply->elements) {
        uint64_t bytes = e.count * e.row_size();
        std::vector<char> buf(bytes);
        if (bytes && fread(buf.data(), 1, bytes, f) != bytes) {
            fclose(f);
            delete ply;
            return nullptr;
        }
        ply->element_data.push_back(std::move(buf));
    }
    fclose(f);
    return ply;
}

int r3dgs_ply_num_elements(void* h) {
    return (int)((PlyFile*)h)->elements.size();
}

const char* r3dgs_ply_element_name(void* h, int i) {
    return ((PlyFile*)h)->elements[i].name.c_str();
}

uint64_t r3dgs_ply_element_count(void* h, int i) {
    return ((PlyFile*)h)->elements[i].count;
}

int r3dgs_ply_num_properties(void* h, int i) {
    return (int)((PlyFile*)h)->elements[i].props.size();
}

const char* r3dgs_ply_property_name(void* h, int i, int j) {
    return ((PlyFile*)h)->elements[i].props[j].name.c_str();
}

int r3dgs_ply_property_dtype(void* h, int i, int j) {
    return ((PlyFile*)h)->elements[i].props[j].dtype;
}

// Copies the raw interleaved rows of element i into out (caller sized).
void r3dgs_ply_element_rows(void* h, int i, char* out) {
    auto* ply = (PlyFile*)h;
    memcpy(out, ply->element_data[i].data(), ply->element_data[i].size());
}

void r3dgs_ply_close(void* h) { delete (PlyFile*)h; }

// --------------------------------------------------------------- PLY write
// Writes a binary_little_endian PLY in one shot. `header` is the full ascii
// header (including end_header\n); bufs/sizes are the per-element
// interleaved row blobs.
int r3dgs_ply_write(const char* path, const char* header,
                    const char** bufs, const uint64_t* sizes, int n) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    fwrite(header, 1, strlen(header), f);
    for (int i = 0; i < n; i++) fwrite(bufs[i], 1, sizes[i], f);
    fclose(f);
    return 0;
}

// ----------------------------------------------------------- COLMAP points
// Parses points3D.bin into xyz (f64[n,3]) and rgb (u8[n,3]). Two-call
// protocol: first with xyz==null to get the count.
int64_t r3dgs_colmap_points(const char* path, double* xyz, uint8_t* rgb) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t n;
    if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
    if (!xyz) { fclose(f); return (int64_t)n; }
    for (uint64_t i = 0; i < n; i++) {
        struct __attribute__((packed)) {
            uint64_t id;
            double x, y, z;
            uint8_t r, g, b;
            double err;
        } rec;
        if (fread(&rec, sizeof(rec), 1, f) != 1) { fclose(f); return -1; }
        xyz[i * 3 + 0] = rec.x;
        xyz[i * 3 + 1] = rec.y;
        xyz[i * 3 + 2] = rec.z;
        rgb[i * 3 + 0] = rec.r;
        rgb[i * 3 + 1] = rec.g;
        rgb[i * 3 + 2] = rec.b;
        uint64_t track_len;
        if (fread(&track_len, 8, 1, f) != 1) { fclose(f); return -1; }
        fseek(f, (long)(8 * track_len), SEEK_CUR);
    }
    fclose(f);
    return (int64_t)n;
}

}  // extern "C"
